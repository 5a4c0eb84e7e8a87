"""Non-square detection buckets (VERDICT r2 next #4).

The reference det pipeline is keep-ratio (1333, 800)
(/root/reference/configs/_base_/det/dior.py) — non-square outputs. The
static-shape TPU path supports this via a config-driven bucket LIST
(``loader.det_bucket_hw`` accepts multiple (H, W) pairs): collate pads
each batch to the tightest fitting bucket, one compiled step per bucket,
and the scan dispatcher groups by (task, dataset, img shape).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rscotr_tpu.data.loader import collate_det, select_det_bucket  # noqa

BUCKETS = [(256, 256), (192, 256), (256, 192), (384, 256)]


def _det_sample(h, w, n=3, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(h, w, 3)).astype(np.float32)
    x1 = rng.uniform(0, w * 0.5, n)
    y1 = rng.uniform(0, h * 0.5, n)
    boxes = np.stack([x1, y1, x1 + rng.uniform(4, w * 0.3, n),
                      y1 + rng.uniform(4, h * 0.3, n)], -1)
    return {"img": img,
            "gt_bboxes": boxes.astype(np.float32),
            "gt_labels": rng.integers(0, 5, n).astype(np.int32),
            "scale_factor": np.asarray([0.5, 0.5, 0.5, 0.5], np.float32)}


class TestBucketSelection:
    def test_tightest_fit(self):
        assert select_det_bucket(BUCKETS, 150, 200) == (192, 256)
        assert select_det_bucket(BUCKETS, 200, 150) == (256, 192)
        assert select_det_bucket(BUCKETS, 200, 200) == (256, 256)
        assert select_det_bucket(BUCKETS, 300, 200) == (384, 256)

    def test_single_pair_back_compat(self):
        assert select_det_bucket((800, 800), 600, 700) == (800, 800)

    def test_oversize_raises(self):
        with pytest.raises(AssertionError):
            select_det_bucket(BUCKETS, 400, 400)

    def test_collate_pads_to_tightest(self):
        batch = collate_det([_det_sample(150, 200), _det_sample(120, 250)],
                            BUCKETS, max_gt=8)
        assert batch["img"].shape == (2, 192, 256, 3)
        assert batch["img_hw"].tolist() == [[150, 200], [120, 250]]
        # padding region stays zero
        assert float(np.abs(batch["img"][0, 150:]).max()) == 0.0
        assert float(np.abs(batch["img"][1, :, 250:]).max()) == 0.0

    def test_collate_keeps_gt_in_padded_coords(self):
        s = _det_sample(150, 200)
        batch = collate_det([s], BUCKETS, max_gt=8)
        np.testing.assert_array_equal(batch["gt_bboxes"][0, :3],
                                      s["gt_bboxes"])
        assert batch["gt_valid"][0, :3].all()
        assert not batch["gt_valid"][0, 3:].any()


@pytest.fixture(scope="module")
def tiny_det():
    from rscotr_tpu.config import Config
    from rscotr_tpu.apis import (init_model_params, make_step_config)
    from rscotr_tpu.data import load_data_cfg
    from rscotr_tpu.models import build_model

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(
        os.path.join(root, "configs/multi/MTL_tiny_synthetic.py"))
    cfg = load_data_cfg(cfg, config_root=root)
    cfg.model["cls_head"] = None
    cfg.model["seg_head"] = None
    cfg.data = {"dior": cfg.data["dior"]}
    # bucket list replaces the single square bucket
    cfg.data["dior"]["loader"]["det_bucket_hw"] = [(256, 256), (192, 256)]
    model = build_model(cfg.model)
    params = init_model_params(model, cfg, seed=0)
    return cfg, model, params


@pytest.mark.slow
class TestNonSquareTrainEval:
    def test_train_step_both_buckets(self, tiny_det):
        from rscotr_tpu.engine import (build_optimizer, make_train_step,
                                       task_param_masks)
        from rscotr_tpu.apis import make_step_config

        cfg, model, params = tiny_det
        optimizer = build_optimizer(dict(type="AdamW", lr=1e-4),
                                    params["params"],
                                    lr_config=dict(policy="fixed"))
        opt_state = optimizer.init(params["params"])
        masks = task_param_masks(params["params"], cls_uses_encoder=False)
        step = make_train_step(model, optimizer, "det",
                               make_step_config(cfg), masks["det"],
                               donate=False)
        for shape_hw, (h, w) in ((None, (220, 220)), (None, (150, 200))):
            batch = collate_det([_det_sample(h, w, seed=h)],
                                [(256, 256), (192, 256)], max_gt=20)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            p2, o2, lv = step(params, opt_state, jb, jax.random.key(0))
            assert np.isfinite(float(lv["loss"])), (h, w)
        assert batch["img"].shape[1:3] == (192, 256)

    def test_eval_rescale_nonsquare(self, tiny_det):
        """Boxes come back in ORIGINAL image coordinates: doubling
        scale_factor halves the returned boxes (dino_get_bboxes
        rescale=True divides by scale_factor)."""
        from rscotr_tpu.engine import make_infer_steps

        cfg, model, params = tiny_det
        infer = make_infer_steps(model, max_per_img=10)
        batch = collate_det([_det_sample(150, 200)],
                            [(256, 256), (192, 256)], max_gt=20)
        img = jnp.asarray(batch["img"])
        hw = jnp.asarray(batch["img_hw"])
        det1, lab1 = infer["det"](params, img, hw,
                                  jnp.asarray([[1.0, 1.0, 1.0, 1.0]]))
        det2, lab2 = infer["det"](params, img, hw,
                                  jnp.asarray([[2.0, 2.0, 2.0, 2.0]]))
        np.testing.assert_array_equal(np.asarray(lab1), np.asarray(lab2))
        np.testing.assert_allclose(np.asarray(det1)[..., :4],
                                   np.asarray(det2)[..., :4] * 2.0,
                                   rtol=1e-5, atol=1e-4)
        # scores identical
        np.testing.assert_allclose(np.asarray(det1)[..., 4],
                                   np.asarray(det2)[..., 4], rtol=1e-6)

    def test_format_only_nonsquare(self, tiny_det, tmp_path):
        """--format-only submission dump on a non-square batch: per-class
        arrays land in the COCO-style json path via format_results."""
        from rscotr_tpu.engine import make_infer_steps, single_device_test
        from rscotr_tpu.data.datasets import SyntheticDetDataset
        from rscotr_tpu.data.loader import TaskDataLoader

        cfg, model, params = tiny_det

        class NonSquareDet(SyntheticDetDataset):
            def __getitem__(self, idx):
                s = super().__getitem__(idx)
                s["img"] = s["img"][:192]          # 192 x 256
                s["ori_shape"] = (384, 512, 3)
                s["scale_factor"] = np.asarray([0.5, 0.5, 0.5, 0.5],
                                               np.float32)
                return s

        ds = NonSquareDet(length=2, img_size=256, num_classes=20,
                          max_boxes=5)
        ds.dataset_name = "d"
        dl = TaskDataLoader(
            ds, batch_size=1,
            collate_fn=lambda ss: collate_det(
                ss, [(256, 256), (192, 256)], max_gt=20),
            shuffle=False, num_threads=1, drop_last=False)
        infer = make_infer_steps(model, max_per_img=10)
        results = single_device_test(infer, params, {"d": dl})
        assert len(results["d"]) == 2
        files = ds.format_results(results["d"], str(tmp_path))
        assert files and os.path.exists(files[0])
