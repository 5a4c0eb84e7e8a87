#!/usr/bin/env python
"""Per-stage timing breakdown of the flagship MTL inference path.

Splits each task's forward into backbone+neck vs full forward, and times the
MSDA sampling core alone at encoder shapes, so the gather-bound fraction is
visible (SURVEY §5.1 profiling; the reference relies on mmcv IterTimerHook
only). Uses the same honesty discipline as bench.py: distinct inputs per
iteration, sync by device->host value read (block_until_ready does not sync
through the axon tunnel).

Usage: python tools/profile_breakdown.py [--iters 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rscotr_tpu.utils import (honor_jax_platforms_env,  # noqa: E402
                              setup_compile_cache)

honor_jax_platforms_env()
setup_compile_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--train", action="store_true",
                   help="profile det/seg TRAIN-step stages instead of "
                        "inference (model fwd / loss fwd / grad / update, "
                        "plus the batched Hungarian LAP alone)")
    args = p.parse_args()
    if args.train:
        return train_breakdown(args)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from rscotr_tpu.config import Config
    from rscotr_tpu.data import load_data_cfg
    from rscotr_tpu.engine import make_infer_steps
    from rscotr_tpu.models import build_model
    from rscotr_tpu.ops.ms_deform_attn import ms_deform_attn

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(os.path.join(
        root, "configs/multi/MTL_slvlcls_swin-t-p4-w7_1x1_"
              "resisc_dior_potsdam.py"))
    cfg = load_data_cfg(cfg, config_root=root)
    model = build_model(cfg.model)

    rng = jax.random.key(0)
    cls_img = jax.random.normal(rng, (16, 224, 224, 3), jnp.float32)
    det_img = jax.random.normal(rng, (1, 800, 800, 3), jnp.float32)
    det_hw = jnp.asarray([[800, 800]], jnp.int32)
    det_sf = jnp.ones((1, 4), jnp.float32)
    seg_img = jax.random.normal(rng, (2, 512, 512, 3), jnp.float32)
    params = model.init(rng, cls_img=cls_img[:1], det_img=det_img[:1],
                        det_img_hw=det_hw[:1], seg_img=seg_img[:1])
    infer = make_infer_steps(model, max_per_img=300)

    def feat_fn(params, img):
        nk, _ = model.apply(params, img, deterministic=True,
                            method=model.extract_feat)
        return nk

    feat = jax.jit(feat_fn)

    # MSDA core at encoder shapes (6 dependent layers inside one jit)
    def msda6(value, locs, attn, shapes):
        v = value
        for _ in range(6):
            v = ms_deform_attn(v, shapes, locs, attn).reshape(v.shape)
        return v

    def msda_args(key, B, shapes, dtype):
        nv = sum(h * w for h, w in shapes)
        ks = jax.random.split(key, 3)
        value = jax.random.normal(ks[0], (B, nv, 8, 32), dtype)
        locs = jax.random.uniform(ks[1], (B, nv, 8, len(shapes), 4, 2),
                                  jnp.float32)
        attn = jax.nn.softmax(
            jax.random.normal(ks[2], (B, nv, 8, len(shapes), 4)), axis=(-1,))
        return value, locs, attn

    det_shapes = ((100, 100), (50, 50), (25, 25), (13, 13))
    seg_shapes = ((64, 64), (32, 32), (16, 16), (8, 8))
    dt = jnp.bfloat16 if "bfloat16" in str(cfg.model) else jnp.float32
    msda_det = msda_args(rng, 1, det_shapes, dt)
    msda_seg = msda_args(rng, 2, seg_shapes, dt)
    msda_j = {
        "det": jax.jit(lambda v, l, a: msda6(v, l, a, det_shapes)),
        "seg": jax.jit(lambda v, l, a: msda6(v, l, a, seg_shapes)),
    }

    def _sync(out):
        leaf = jax.tree.leaves(out)[0]
        return np.asarray(leaf.ravel()[0])

    def timeit(fn, base_args, perturb_idx=0):
        variants = []
        for i in range(args.iters):
            vs = list(base_args)
            a = vs[perturb_idx]
            vs[perturb_idx] = a + jnp.asarray(1e-3 * (i + 1), a.dtype)
            variants.append(tuple(vs))
        for v in variants:
            for a in v:
                _sync(a)
        for _ in range(args.warmup):
            _sync(fn(*variants[0]))
        t0 = time.perf_counter()
        out = None
        for i in range(args.iters):
            out = fn(*variants[i])
        _sync(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    res = {}
    res["cls_full_ms"] = timeit(lambda i: infer["cls"](params, i),
                                (cls_img,))
    res["det_feat_ms"] = timeit(lambda i: feat(params, i), (det_img,))
    res["det_full_ms"] = timeit(
        lambda i: infer["det"](params, i, det_hw, det_sf), (det_img,))
    res["seg_feat_ms"] = timeit(lambda i: feat(params, i), (seg_img,))
    res["seg_full_ms"] = timeit(lambda i: infer["seg"](params, i),
                                (seg_img,))
    res["msda6_det_ms"] = timeit(
        lambda v: msda_j["det"](v, *msda_det[1:]), (msda_det[0],))
    res["msda6_seg_ms"] = timeit(
        lambda v: msda_j["seg"](v, *msda_seg[1:]), (msda_seg[0],))
    res["det_head_ms"] = round(res["det_full_ms"] - res["det_feat_ms"], 2)
    res["seg_head_ms"] = round(res["seg_full_ms"] - res["seg_feat_ms"], 2)
    res = {k: round(v, 2) for k, v in res.items()}
    res["device"] = getattr(jax.devices()[0], "device_kind",
                            str(jax.devices()[0]))
    print(json.dumps(res))


def train_breakdown(args):
    """Stage split of the det/seg train steps at flagship shapes.

    Times, per task: model forward only, full loss forward (incl. the
    vmapped Hungarian matchings for det), value_and_grad (no update),
    full step (grad + masked AdamW update), and — det only — the batched
    7x(100 gt x 900 query) LAP solve alone. Differences attribute the
    residual beyond the MSDA scatter backward."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from rscotr_tpu.apis import make_step_config
    from rscotr_tpu.config import Config
    from rscotr_tpu.data import load_data_cfg
    from rscotr_tpu.engine import (build_optimizer, make_train_step,
                                   task_param_masks)
    from rscotr_tpu.engine.train_step import LOSS_FNS, parse_losses
    from rscotr_tpu.models import build_model
    from rscotr_tpu.ops.matcher import hungarian_batched

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(os.path.join(
        root, "configs/multi/MTL_slvlcls_swin-t-p4-w7_1x1_"
              "resisc_dior_potsdam.py"))
    cfg = load_data_cfg(cfg, config_root=root)
    model = build_model(cfg.model)
    step_cfg = make_step_config(cfg)

    nprng = np.random.default_rng(0)
    jrng = jax.random.key(0)

    def det_batch():
        G = 100
        S = 800
        cx = nprng.uniform(0.2, 0.8, size=(1, G))
        wh = nprng.uniform(0.05, 0.2, size=(1, G, 2))
        boxes = np.stack([(cx - wh[..., 0] / 2) * S,
                          (cx - wh[..., 1] / 2) * S,
                          (cx + wh[..., 0] / 2) * S,
                          (cx + wh[..., 1] / 2) * S], -1).astype(np.float32)
        return {"img": jnp.asarray(nprng.normal(
                    size=(1, S, S, 3)).astype(np.float32)),
                "img_hw": jnp.asarray([[S, S]], jnp.int32),
                "gt_bboxes": jnp.asarray(boxes),
                "gt_labels": jnp.asarray(nprng.integers(
                    0, 20, size=(1, G)).astype(np.int32)),
                "gt_valid": jnp.asarray(np.arange(G)[None] < 10)}

    def seg_batch():
        return {"img": jnp.asarray(nprng.normal(
                    size=(2, 512, 512, 3)).astype(np.float32)),
                "img_hw": jnp.asarray([[512, 512]] * 2, jnp.int32),
                "gt_semantic_seg": jnp.asarray(nprng.integers(
                    0, 5, size=(2, 512, 512)).astype(np.int32))}

    mk = {"det": det_batch, "seg": seg_batch}
    params = model.init(jrng, cls_img=jnp.zeros((1, 224, 224, 3)),
                        det_img=det_batch()["img"],
                        det_img_hw=jnp.asarray([[800, 800]], jnp.int32),
                        seg_img=jnp.zeros((1, 512, 512, 3)))
    lr_cfg = dict(cfg.get("lr_config", {}) or {})
    lr_cfg.setdefault("max_iters", 1000)
    optimizer = build_optimizer(cfg.optimizer, params["params"],
                                lr_config=lr_cfg)
    opt_state = optimizer.init(params["params"])
    masks = task_param_masks(params["params"], cls_uses_encoder=False)

    def _sync(out):
        leaf = jax.tree.leaves(out)[0]
        return np.asarray(leaf.ravel()[0])

    def timeit(fn, batches):
        for i in range(args.warmup):
            out = fn(batches[i % len(batches)])
        _sync(out)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fn(batches[i])
        _sync(out)
        return round((time.perf_counter() - t0) / args.iters * 1e3, 2)

    res = {}
    for task in ("det", "seg"):
        batches = [mk[task]() for _ in range(args.iters)]
        loss_fn = LOSS_FNS[task]

        fwd_model = {
            "det": jax.jit(lambda p, b: model.apply(
                p, b["img"], b["img_hw"], None, None, None,
                deterministic=False, rngs={"dropout": jrng},
                method=model.forward_det)),
            "seg": jax.jit(lambda p, b: model.apply(
                p, b["img"], deterministic=False, rngs={"dropout": jrng},
                method=model.forward_seg)),
        }[task]

        @jax.jit
        def fwd_loss(p, b):
            return parse_losses(
                loss_fn(model, p, b, jrng, step_cfg, train=True))[0]

        grad_fn = jax.jit(jax.value_and_grad(
            lambda p, b: parse_losses(
                loss_fn(model, p, b, jrng, step_cfg, train=True))[0]))
        step = make_train_step(model, optimizer, task, step_cfg,
                               masks[task], donate=False)

        res[f"{task}_model_fwd_ms"] = timeit(
            lambda b: fwd_model(params, b), batches)
        res[f"{task}_loss_fwd_ms"] = timeit(
            lambda b: fwd_loss(params, b), batches)
        res[f"{task}_grad_ms"] = timeit(
            lambda b: grad_fn(params, b)[1], batches)
        res[f"{task}_step_ms"] = timeit(
            lambda b: step(params, opt_state, b, jrng)[2], batches)

    # batched LAP alone: the 7 per-layer matchings of one det step
    costs = [jnp.asarray(nprng.normal(size=(7, 100, 600)).astype(np.float32))
             for _ in range(args.iters)]
    res["det_lap7_ms"] = timeit(lambda c: hungarian_batched(c), costs)

    res["device"] = getattr(jax.devices()[0], "device_kind",
                            str(jax.devices()[0]))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
