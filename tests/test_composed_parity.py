"""Composed N-step train-recipe parity vs a torch transliteration.

VERDICT r2 next #1: every module is parity-tested in isolation, but nothing
checked the COMPOSITION — loss weights, avg_factor reductions across decoder
layers, CDN/matcher interaction, optimizer coupling. Here a from-scratch
torch MTL trainer (tests/helpers/torch_mtl_oracle.py — reference semantics,
mm key layout) and our jitted train steps start from IDENTICAL weights
(via utils/torch_convert), consume IDENTICAL batches and injected CDN noise,
and must produce the same per-step namespaced loss terms AND the same
updated parameters after several optimizer steps — per task and with the
tasks interleaved (the real co-training recipe, reference
multitask_learner.py:229-306 + mtl/utils/optimizer.py:40-55).

A mis-weighted auxiliary loss, a wrong avg_factor, a CDN slot-layout bug,
or a task-mask/optimizer divergence all fail this test.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from helpers import torch_mtl_oracle as O  # noqa: E402

from rscotr_tpu.engine.optimizer import (build_optimizer,  # noqa: E402
                                         task_param_masks)
from rscotr_tpu.engine.train_step import (TrainStepConfig,  # noqa: E402
                                          make_train_step)
from rscotr_tpu.models.backbones.swin import SwinTransformer  # noqa: E402
from rscotr_tpu.models.heads.cdn import CdnConfig  # noqa: E402
from rscotr_tpu.models.heads.cls_heads import SlvlClsHead  # noqa: E402
from rscotr_tpu.models.heads.dino_head import DINOHead  # noqa: E402
from rscotr_tpu.models.heads.dino_loss import DetLossConfig  # noqa: E402
from rscotr_tpu.models.heads.mask2former_head import \
    Mask2FormerHead  # noqa: E402
from rscotr_tpu.models.layers.transformer import \
    DeformableEncoder  # noqa: E402
from rscotr_tpu.models.mtl import MTL  # noqa: E402
from rscotr_tpu.models.necks.channel_mapper import ChannelMapper  # noqa: E402
from rscotr_tpu.utils import torch_convert as tc  # noqa: E402

# tiny-but-complete dimensions
SWIN_DIM, ENC_C, HEADS, LEVELS, POINTS, FFN = 16, 32, 2, 2, 4, 64
N_ENC, N_DET_DEC, N_SEG_DEC = 2, 2, 3
K_CLS, K_DET, K_SEG = 8, 6, 5
NQ_DET, Q_SEG = 12, 6
MAX_GT, NUM_DN, DN_MAX_GT = 4, 8, 3
STRIDES = (4, 8)
TASK_WEIGHT = {"cls": 1.0, "det": 1.0, "seg": 0.1}
LR, WD, CLIP = 1e-3, 1e-4, 0.1


def _leaf_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_leaf_paths(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = tuple(np.shape(v))
    return out


def build_torch_mtl(seed=0):
    torch.manual_seed(seed)
    swin = O.TorchTinySwin(dim=SWIN_DIM, depth=2, heads=HEADS, window=4)
    neck = O.TorchChannelMapper((SWIN_DIM,), ENC_C, extra=1, groups=8)
    enc = O.TorchEncoder(N_ENC, ENC_C, HEADS, LEVELS, POINTS, FFN)
    cls_head = O.TorchClsHead(SWIN_DIM, K_CLS)
    bbox_head = O.TorchDINOHead(K_DET, NQ_DET, ENC_C, HEADS, LEVELS,
                                POINTS, FFN, N_DET_DEC, STRIDES,
                                pos_temperature=20.0)
    seg_head = O.TorchMask2FormerHead(K_SEG, Q_SEG, ENC_C, HEADS, FFN,
                                      N_SEG_DEC, LEVELS, STRIDES)
    return O.TorchMTL(swin, neck, enc, cls_head, bbox_head, seg_head)


def build_jax_mtl():
    return MTL(
        backbone=SwinTransformer(embed_dims=SWIN_DIM, depths=(2,),
                                 num_heads=(HEADS,), window_size=4,
                                 drop_path_rate=0.0, out_indices=(0,)),
        neck=ChannelMapper(in_channels=(SWIN_DIM,), out_channels=ENC_C,
                           kernel_size=1, num_outs=2, norm_groups=8),
        shared_encoder=DeformableEncoder(
            num_layers=N_ENC, embed_dims=ENC_C, num_heads=HEADS,
            num_levels=LEVELS, num_points=POINTS,
            feedforward_channels=FFN),
        cls_head=SlvlClsHead(num_classes=K_CLS, in_channels=SWIN_DIM),
        bbox_head=DINOHead(num_classes=K_DET, num_query=NQ_DET,
                           embed_dims=ENC_C,
                           num_decoder_layers=N_DET_DEC,
                           num_feature_levels=LEVELS, num_heads=HEADS,
                           num_points=POINTS, feedforward_channels=FFN,
                           strides=STRIDES),
        seg_head=Mask2FormerHead(
            in_channels=(SWIN_DIM,), feat_channels=ENC_C,
            out_channels=ENC_C, num_classes=K_SEG, num_queries=Q_SEG,
            num_transformer_feat_level=LEVELS, scheme=2, num_heads=HEADS,
            num_decoder_layers=N_SEG_DEC, feedforward_channels=FFN,
            pixel_decoder_strides=STRIDES),
        neck_in_levels=1)


def convert_weights(tmtl):
    # .copy() is load-bearing: jnp.asarray on the CPU backend ZERO-COPIES
    # aligned numpy buffers, and .detach().numpy() aliases torch parameter
    # storage — without the copy, torch's in-place AdamW step would mutate
    # the "initial" jax params mid-comparison.
    sd = {k: v.detach().numpy().copy() for k, v in tmtl.state_dict().items()
          if "rel_idx" not in k}
    return {
        "backbone": tc.convert_swin_original(
            {k.removeprefix("backbone."): v for k, v in sd.items()
             if k.startswith("backbone.")}, depths=(2,)),
        "neck": tc.convert_channel_mapper(sd),
        "shared_encoder": tc.convert_deformable_encoder(sd),
        "cls_head": tc.convert_cls_head(sd),
        "bbox_head": tc.convert_dino_head(sd),
        "seg_head": tc.convert_mask2former_head(sd),
    }


def step_cfg():
    return TrainStepConfig(
        task_weight=TASK_WEIGHT, cls_num_classes=K_CLS,
        cls_label_smooth=0.1, cls_use_augments=False,
        seg_ignore_index=255, seg_loss_weight=1.0,
        cdn=CdnConfig(num_classes=K_DET, num_queries=NQ_DET,
                      max_gt=MAX_GT, num_dn_queries=NUM_DN,
                      dn_max_gt=DN_MAX_GT),
        det=DetLossConfig(num_classes=K_DET), img_norm=None)


def make_batches(seed=0):
    rng = np.random.default_rng(seed)
    known = [2, 3]      # max == DN_MAX_GT so groups match the reference
    B = len(known)
    det_hw = np.asarray([[64, 64], [48, 64]], np.int32)
    det_img = rng.normal(size=(B, 64, 64, 3)).astype(np.float32) * 0.5
    for b, (h, w) in enumerate(det_hw):
        det_img[b, h:] = 0.0
        det_img[b, :, w:] = 0.0
    gt_bboxes = np.zeros((B, MAX_GT, 4), np.float32)
    gt_labels = np.zeros((B, MAX_GT), np.int32)
    gt_valid = np.zeros((B, MAX_GT), bool)
    for b, n in enumerate(known):
        h, w = det_hw[b]
        x1 = rng.uniform(2, w * 0.5, n)
        y1 = rng.uniform(2, h * 0.5, n)
        bw = rng.uniform(6, w * 0.4, n)
        bh = rng.uniform(6, h * 0.4, n)
        gt_bboxes[b, :n] = np.stack(
            [x1, y1, np.minimum(x1 + bw, w - 1),
             np.minimum(y1 + bh, h - 1)], -1)
        gt_labels[b, :n] = rng.integers(0, K_DET, n)
        gt_valid[b, :n] = True
    det = dict(img=det_img, img_hw=det_hw, gt_bboxes=gt_bboxes,
               gt_labels=gt_labels, gt_valid=gt_valid, known=known)
    cls = dict(img=rng.normal(size=(2, 32, 32, 3)).astype(np.float32) * 0.5,
               gt_label=rng.integers(0, K_CLS, 2).astype(np.int32))
    seg = dict(img=rng.normal(size=(2, 32, 32, 3)).astype(np.float32) * 0.5,
               gt_semantic_seg=rng.integers(
                   0, K_SEG + 1, (2, 32, 32)).astype(np.int32))
    return cls, det, seg


def make_cdn_noise(known, seed):
    """Flat (reference-layout) noise + its (B, blocks, S) mirror."""
    rng = np.random.default_rng(seed)
    S = max(known)
    ng = max(NUM_DN // S, 1)
    blocks = 2 * ng
    total = sum(known) * blocks
    p = rng.uniform(0, 1, total).astype(np.float32)
    newl = rng.integers(0, K_DET, total)
    sign = (rng.integers(0, 2, (total, 4)) * 2 - 1).astype(np.float32)
    part = rng.uniform(0, 1, (total, 4)).astype(np.float32)

    def to_bjs(flat):
        Bn = len(known)
        offs = np.cumsum([0] + known[:-1])
        out = np.zeros((Bn, blocks, S) + flat.shape[1:], flat.dtype)
        tot = sum(known)
        for j in range(blocks):
            for b, n in enumerate(known):
                out[b, j, :n] = flat[j * tot + offs[b]:j * tot + offs[b] + n]
        return out

    torch_noise = dict(p_flat=p, new_label_flat=newl.astype(np.int64),
                       sign_flat=sign, part_flat=part)
    jax_noise = dict(dn_noise_p=to_bjs(p),
                     dn_noise_new_label=to_bjs(newl.astype(np.int32)),
                     dn_noise_sign=to_bjs(sign),
                     dn_noise_part=to_bjs(part))
    return torch_noise, jax_noise


@pytest.fixture(scope="module")
def setup():
    tmtl = build_torch_mtl()
    model = build_jax_mtl()
    cfg = step_cfg()
    cls_b, det_b, seg_b = make_batches()
    from rscotr_tpu.models.heads.cdn import cdn_self_attn_mask
    params = model.init(
        jax.random.key(0),
        cls_img=jnp.asarray(cls_b["img"][:1]),
        det_img=jnp.asarray(det_b["img"][:1]),
        det_img_hw=jnp.asarray(det_b["img_hw"][:1]),
        seg_img=jnp.asarray(seg_b["img"][:1]),
        dn_label_query=jnp.zeros((1, cfg.cdn.pad_size, ENC_C)),
        dn_bbox_query=jnp.zeros((1, cfg.cdn.pad_size, 4)),
        attn_mask=jnp.asarray(cdn_self_attn_mask(cfg.cdn)))
    converted = convert_weights(tmtl)
    # structural identity: the converter must cover EVERY leaf
    assert _leaf_paths(converted) == _leaf_paths(params["params"])
    params = {"params": jax.tree.map(jnp.asarray, converted)}

    optimizer = build_optimizer(
        dict(type="AdamW", lr=LR, weight_decay=WD), params["params"],
        lr_config=None, grad_clip=dict(max_norm=CLIP))
    opt_state = optimizer.init(params["params"])
    masks = task_param_masks(params["params"], cls_uses_encoder=False)
    steps = {t: make_train_step(model, optimizer, t, cfg, masks[t],
                                donate=False)
             for t in ("cls", "det", "seg")}
    import copy
    init_sd = copy.deepcopy(tmtl.state_dict())
    return dict(model=model, params=params, opt_state=opt_state,
                steps=steps, tmtl=tmtl, init_sd=init_sd,
                batches=dict(cls=cls_b, det=det_b, seg=seg_b))


def _jax_losses(log_vars, task):
    out = {}
    for k, v in log_vars.items():
        if k == "grad_norm":
            continue
        k = k.removeprefix("seg.")
        out[k] = float(v)
    return out


def _run_both(setup, schedule, rtol=2e-3, atol=2e-4):
    """Run the same task schedule through both trainers from the same
    weights; compare every namespaced loss term per step and the final
    params."""
    params = jax.tree.map(jnp.asarray, setup["params"])
    opt_state = jax.tree.map(jnp.asarray, setup["opt_state"])
    # both sides restart from the SAME initial weights for every schedule
    setup["tmtl"].load_state_dict(setup["init_sd"])
    trainer = O.TorchMTLTrainer(
        setup["tmtl"], TASK_WEIGHT,
        cdn_cfg=dict(num_classes=K_DET, num_queries=NQ_DET, num_dn=NUM_DN),
        det_cfg=dict(num_classes=K_DET),
        lr=LR, weight_decay=WD, grad_clip=CLIP)
    batches = setup["batches"]
    with jax.default_matmul_precision("highest"):
        for i, task in enumerate(schedule):
            batch = {k: v for k, v in batches[task].items() if k != "known"}
            t_noise = j_noise = None
            if task == "det":
                t_noise, j_noise = make_cdn_noise(
                    batches["det"]["known"], seed=100 + i)
                batch = dict(batch, **j_noise)
            want = trainer.step(task, batches[task], cdn_noise=t_noise)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, lv = setup["steps"][task](
                params, opt_state, jb, jax.random.key(i))
            got = _jax_losses(lv, task)
            assert set(got) == set(want), (task, sorted(got), sorted(want))
            for k in want:
                np.testing.assert_allclose(
                    got[k], want[k], rtol=rtol, atol=atol,
                    err_msg=f"step {i} task {task} loss term {k}")
    final_torch = convert_weights(setup["tmtl"])
    got_leaves = _leaf_paths(params["params"])
    want_leaves = _leaf_paths(final_torch)
    assert got_leaves == want_leaves
    flat_got, _ = jax.tree_util.tree_flatten_with_path(params["params"])
    flat_want = jax.tree.leaves(final_torch)
    bad = []
    for (path, g), w in zip(flat_got, flat_want):
        g, w = np.asarray(g), np.asarray(w)
        # atol: Adam normalizes each step to ~lr, so a leaf whose true grad
        # is near zero amplifies fp noise into O(1e-4) update differences
        # over a few steps; a REAL composition bug (wrong weight/avg_factor/
        # masking) shifts updates by O(lr * steps) = 2e-3+, still caught.
        err = np.abs(g - w) - (2e-4 + 5e-3 * np.abs(w))
        if (err > 0).any():
            name = jax.tree_util.keystr(path)
            i = np.unravel_index(np.argmax(err), err.shape)
            bad.append(f"{name}{list(i)}: got {g[i]:.6g} want {w[i]:.6g}")
    assert not bad, "final params diverged:\n" + "\n".join(bad[:20])


@pytest.mark.slow
class TestComposedRecipeParity:
    def test_cls_recipe(self, setup):
        _run_both(setup, ["cls", "cls", "cls"])

    def test_seg_recipe(self, setup):
        _run_both(setup, ["seg", "seg", "seg"])

    def test_det_recipe(self, setup):
        _run_both(setup, ["det", "det"])

    def test_interleaved_mtl_recipe(self, setup):
        """The real co-training composition: per-task optimizer masks must
        reproduce torch's unused-param (grad is None) semantics across an
        interleaved schedule."""
        _run_both(setup, ["cls", "det", "seg", "det", "seg", "cls"])
