"""End-to-end smoke: tiny MTL on synthetic data — config->model->train
steps (all 3 tasks)->eval->checkpoint roundtrip. The 'minimum end-to-end
slice' milestone of SURVEY.md §7.3, on CPU-sized shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rscotr_tpu.data import (MultiDataLoader, TaskDataLoader, collate_cls,
                             collate_det, collate_seg, strategies_map)
from rscotr_tpu.data.datasets import (SyntheticClsDataset,
                                      SyntheticDetDataset,
                                      SyntheticSegDataset)
from rscotr_tpu.engine import (TrainStepConfig, build_optimizer,
                               make_infer_steps, make_train_step,
                               make_val_step, single_device_test,
                               evaluate_results, task_param_masks)
from rscotr_tpu.models import build_model
from rscotr_tpu.models.heads import CdnConfig, DetLossConfig

TINY_MODEL_CFG = dict(
    type="MTL",
    backbone=dict(type="SwinTransformer", embed_dims=16,
                  depths=[1, 1, 1, 1], num_heads=[1, 2, 2, 2],
                  window_size=4, drop_path_rate=0.0),
    neck=dict(type="ChannelMapper", in_channels=[32, 64, 128],
              kernel_size=1, out_channels=32,
              norm_cfg=dict(type="GN", num_groups=8), num_outs=4),
    shared_encoder=dict(
        type="DetrTransformerEncoder", num_layers=1,
        transformerlayers=dict(
            attn_cfgs=dict(type="MultiScaleDeformableAttention",
                           embed_dims=32, num_levels=4, num_heads=4,
                           num_points=2, dropout=0.0),
            ffn_cfgs=dict(feedforward_channels=64, ffn_drop=0.0))),
    cls_head=dict(type="SlvlClsHead", num_classes=7, in_channels=128),
    bbox_head=dict(
        type="DINOHead", num_query=12, num_classes=5, num_feature_levels=4,
        transformer=dict(decoder=dict(
            num_layers=2,
            transformerlayers=dict(
                attn_cfgs=[dict(embed_dims=32, num_heads=4),
                           dict(embed_dims=32, num_heads=4, num_points=2)],
                ffn_cfgs=dict(feedforward_channels=64)))),
        positional_encoding=dict(temperature=20)),
    seg_head=dict(
        type="Mask2FormerHead", in_channels=[16, 32, 64, 128],
        scheme=2, feat_channels=32, out_channels=32, num_classes=3,
        num_queries=8, num_transformer_feat_level=4,
        transformer_decoder=dict(
            num_layers=2,
            transformerlayers=dict(attn_cfgs=dict(num_heads=4),
                                   ffn_cfgs=dict(
                                       feedforward_channels=64))),
        positional_encoding=dict(temperature=10000)),
)


@pytest.fixture(scope="module")
def setup():
    model = build_model(TINY_MODEL_CFG)
    rng = jax.random.key(0)
    G = 6
    cdn_cfg = CdnConfig(num_classes=5, num_queries=12, max_gt=G,
                        num_dn_queries=6, box_noise_scale=1.0)
    det_cfg = DetLossConfig(num_classes=5)
    step_cfg = TrainStepConfig(
        task_weight={"cls": 1.0, "det": 1.0, "seg": 0.1},
        cls_num_classes=7, seg_ignore_index=255, cdn=cdn_cfg, det=det_cfg)

    from rscotr_tpu.models.heads import cdn_self_attn_mask, \
        generate_cdn_queries
    # init params by running all three paths once
    cls_img = jnp.zeros((2, 32, 32, 3))
    det_img = jnp.zeros((2, 64, 64, 3))
    det_hw = jnp.array([[64, 64], [48, 56]], jnp.int32)
    seg_img = jnp.zeros((2, 64, 64, 3))
    dn_l = jnp.zeros((2, cdn_cfg.pad_size, 32))
    dn_b = jnp.zeros((2, cdn_cfg.pad_size, 4))
    am = jnp.asarray(cdn_self_attn_mask(cdn_cfg))
    params = model.init(rng, cls_img=cls_img, det_img=det_img,
                        det_img_hw=det_hw, seg_img=seg_img,
                        dn_label_query=dn_l, dn_bbox_query=dn_b,
                        attn_mask=am)
    return model, params, step_cfg, cdn_cfg


def make_batches():
    cls_ds = SyntheticClsDataset(length=8, img_size=32, num_classes=7)
    det_ds = SyntheticDetDataset(length=6, img_size=64, num_classes=5,
                                 max_boxes=4)
    seg_ds = SyntheticSegDataset(length=6, img_size=64, num_classes=3)
    loaders = {
        "resisc": TaskDataLoader(cls_ds, 2, collate_fn=collate_cls,
                                 num_threads=1),
        "dior": TaskDataLoader(
            det_ds, 2, collate_fn=lambda s: collate_det(s, (64, 64), 6),
            num_threads=1),
        "potsdam": TaskDataLoader(
            seg_ds, 2, collate_fn=lambda s: collate_seg(s, 64),
            num_threads=1),
    }
    return loaders


class TestEndToEnd:
    def test_train_steps_all_tasks(self, setup):
        model, params, step_cfg, cdn_cfg = setup
        opt = build_optimizer(
            dict(type="AdamW", lr=1e-4, weight_decay=1e-4,
                 paramwise_cfg=dict(custom_keys={
                     "backbone": dict(lr_mult=0.1),
                     "query_embed": dict(decay_mult=0.0)})),
            params["params"],
            lr_config=dict(policy="step", step=[100]),
            grad_clip=dict(max_norm=0.1))
        opt_state = opt.init(params["params"])
        masks = task_param_masks(params["params"], cls_uses_encoder=False)

        loaders = make_batches()
        strategy = strategies_map["round_robin"](loaders)
        ml = MultiDataLoader(loaders, strategy)
        it = iter(ml)

        steps = {t: make_train_step(model, opt, t, step_cfg, masks[t],
                                    donate=False)
                 for t in ("cls", "det", "seg")}
        p, s = params, opt_state
        seen = []
        before = {t: None for t in ("cls", "det", "seg")}
        for i in range(6):
            batch = next(it)
            task = batch.pop("task")
            batch.pop("dataset_name")
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            p, s, logs = steps[task](p, s, batch,
                                     jax.random.key(100 + i))
            assert np.isfinite(float(logs["loss"])), (task, logs)
            seen.append(task)
        assert seen == ["cls", "det", "seg"] * 2

        # task masking: a cls step must not move the seg head
        leaf_before = params["params"]["seg_head"]
        leaf_after = p["params"]["seg_head"]
        # after det+cls+seg steps seg head DID move; check instead that
        # the optimizer state count for cls_head == number of cls steps
        cnt_cls = jax.tree.leaves(s["count"]["cls_head"])[0]
        cnt_seg = jax.tree.leaves(s["count"]["seg_head"])[0]
        assert int(cnt_cls) == 2 and int(cnt_seg) == 2
        cnt_bb = jax.tree.leaves(s["count"]["backbone"])[0]
        assert int(cnt_bb) == 6  # backbone touched every step

    def test_det_step_with_widened_dn_ladder(self, setup):
        """End-to-end widened-DN path (VERDICT r4 #1/#8): a det batch
        whose collate picked a ladder rung ABOVE dn_max_gt must compile
        and run the full train step at the widened width — the graph
        det_loss_fn builds via ``dataclasses.replace`` from the
        ``dn_wide`` leaf shape (engine/train_step.py), with the
        reference's group count for that rung."""
        import dataclasses as dc
        model, params, step_cfg, cdn_cfg = setup
        # num_dn=6, dn_max_gt=2, max_gt=6 -> exact-parity ladder {2,3,6}
        cdn_narrow = dc.replace(cdn_cfg, dn_max_gt=2)
        cfg_w = dc.replace(step_cfg, cdn=cdn_narrow)
        assert cdn_narrow.num_groups == 3
        opt = build_optimizer(dict(type="AdamW", lr=1e-4,
                                   weight_decay=1e-4),
                              params["params"],
                              lr_config=dict(policy="fixed"))
        opt_state = opt.init(params["params"])
        step = make_train_step(model, opt, "det", cfg_w, donate=False)
        rng = np.random.default_rng(5)
        samples = [{"img": rng.uniform(0, 1, (64, 64, 3)
                                       ).astype(np.float32),
                    "gt_bboxes": np.array([[2, 2, 20, 20],
                                           [10, 12, 40, 44],
                                           [30, 30, 60, 60]], np.float32),
                    "gt_labels": np.array([0, 1, 2], np.int32)}
                   for _ in range(2)]
        batch = collate_det(samples, (64, 64), 6, dn_ladder=(2, 3, 6))
        assert batch["dn_wide"].shape == (0, 3)    # widened rung chosen
        # reference oracle: num_groups = 6 // 3 = 2 at the rung
        wide = dc.replace(cdn_narrow, dn_max_gt=3)
        assert wide.num_groups == 2 and wide.pad_size == 12
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        _, _, logs = step(params, opt_state, batch, jax.random.key(9))
        assert np.isfinite(float(logs["loss"]))

    def test_cls_loss_decreases_on_fixed_batch(self, setup):
        """Training-correctness regression: repeated steps on one fixed
        batch must drive the loss down (grads, masking, optimizer and LR
        plumbing all working together)."""
        import dataclasses

        model, params, step_cfg, cdn_cfg = setup
        cfg = dataclasses.replace(step_cfg, cls_use_augments=False)
        opt = build_optimizer(
            dict(type="AdamW", lr=3e-3, weight_decay=0.0),
            params["params"], lr_config=dict(policy="step", step=[10000]))
        opt_state = opt.init(params["params"])
        masks = task_param_masks(params["params"], cls_uses_encoder=False)
        step = make_train_step(model, opt, "cls", cfg, masks["cls"],
                               donate=False)
        rng = np.random.default_rng(3)
        batch = {
            "img": jnp.asarray(rng.normal(size=(4, 32, 32, 3)),
                               jnp.float32),
            "gt_label": jnp.asarray(rng.integers(0, 7, 4), jnp.int32),
        }
        p, s = params, opt_state
        losses = []
        for i in range(12):
            p, s, logs = step(p, s, batch, jax.random.key(0))
            losses.append(float(logs["loss"]))
        assert all(np.isfinite(losses)), losses
        assert losses[-1] < losses[0] * 0.7, losses

    def test_val_and_infer_and_eval(self, setup):
        model, params, step_cfg, cdn_cfg = setup
        loaders = make_batches()

        val_cls = make_val_step(model, "cls", step_cfg)
        b = next(iter(loaders["resisc"]))
        logs = val_cls(params, {k: jnp.asarray(v) for k, v in b.items()},
                       jax.random.key(0))
        assert np.isfinite(float(logs["loss"]))

        infer = make_infer_steps(model, max_per_img=10)
        results = single_device_test(infer, params, loaders, max_batches=2)
        assert set(results) == {"resisc", "dior", "potsdam"}
        assert results["resisc"][0].shape == (7,)
        assert len(results["dior"][0]) == 5            # per-class lists
        assert results["potsdam"][0].shape == (64, 64)

        datasets = {n: dl.dataset for n, dl in loaders.items()}
        metrics = evaluate_results(
            datasets, results,
            {"cls": dict(topk=(1,)), "det": dict(iou_thrs=[0.5]),
             "seg": dict(metric=["mIoU", "mFscore"])})
        assert "resisc.accuracy_top-1" in metrics
        assert "dior.bbox_mAP" in metrics
        assert "potsdam.mFscore" in metrics

    def test_checkpoint_roundtrip(self, setup, tmp_path):
        model, params, step_cfg, _ = setup
        from rscotr_tpu.engine import (find_latest_checkpoint,
                                       load_checkpoint, save_checkpoint)
        wd = str(tmp_path / "wd")
        save_checkpoint(wd, 42, params, meta={"CLASSES": {"resisc": ["a"]}})
        latest = find_latest_checkpoint(wd)
        assert latest and latest.endswith("iter_42")
        restored = load_checkpoint(latest)
        assert restored["meta"]["iter"] == 42
        x0 = jax.tree.leaves(params)[0]
        x1 = jax.tree.leaves(restored["params"])[0]
        np.testing.assert_allclose(np.asarray(x0), np.asarray(x1))


class TestSlideInference:
    """mmseg slide_inference equivalence (the reference's RSCoTrSeg
    inherits whole/slide from mmseg EncoderDecoder —
    /root/reference/models/seg/rscotr_seg.py:9-25)."""

    def test_slide_single_window_equals_whole(self, setup):
        model, params, _, _ = setup
        img = jax.random.normal(jax.random.key(3), (2, 64, 64, 3))
        whole = make_infer_steps(model)["seg"]
        slide = make_infer_steps(
            model, seg_test_cfg=dict(mode="slide", crop_size=(64, 64),
                                     stride=(64, 64)))["seg"]
        np.testing.assert_array_equal(np.asarray(whole(params, img)),
                                      np.asarray(slide(params, img)))

    def test_slide_multiwindow_matches_numpy_accumulation(self, setup):
        model, params, _, _ = setup
        B, H, W, hc, hs = 1, 96, 96, 64, 32
        img = jax.random.normal(jax.random.key(4), (B, H, W, 3))
        slide = make_infer_steps(
            model, seg_test_cfg=dict(mode="slide", crop_size=(hc, hc),
                                     stride=(hs, hs)))["seg"]
        pred = np.asarray(slide(params, img))

        # numpy oracle: same window grid, per-crop jitted forward + resize,
        # f32 canvas accumulation, count-normalize, argmax
        from rscotr_tpu.engine.train_step import _slide_origins

        @jax.jit
        def crop_logits(p, crop):
            lg = model.apply(p, crop, deterministic=True,
                             method=model.forward_seg)
            return jax.image.resize(
                lg, (crop.shape[0], hc, hc, lg.shape[-1]), method="linear")

        ys = _slide_origins(H, hc, hs)
        xs = _slide_origins(W, hc, hs)
        assert ys == [0, 32] and xs == [0, 32]
        canvas = None
        cnt = np.zeros((H, W, 1), np.float32)
        for y in ys:
            for x in xs:
                lg = np.asarray(crop_logits(
                    params, img[:, y:y + hc, x:x + hc]), np.float32)
                if canvas is None:
                    canvas = np.zeros((B, H, W, lg.shape[-1]), np.float32)
                canvas[:, y:y + hc, x:x + hc] += lg
                cnt[y:y + hc, x:x + hc] += 1.0
        oracle = np.argmax(canvas / cnt, axis=-1)
        assert (pred == oracle).mean() > 0.995
