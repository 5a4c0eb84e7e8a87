"""Data layer tests: strategies, loaders, collation, pipelines, metrics."""

import numpy as np
import pytest

from rscotr_tpu.data import (MultiDataLoader, TaskDataLoader, collate_cls,
                             collate_det, collate_seg, strategies_map)
from rscotr_tpu.data.datasets import (SyntheticClsDataset,
                                      SyntheticDetDataset,
                                      SyntheticSegDataset)


def make_loaders(infinite=False):
    cls_ds = SyntheticClsDataset(length=8, img_size=32)
    det_ds = SyntheticDetDataset(length=6, img_size=64)
    seg_ds = SyntheticSegDataset(length=6, img_size=64)
    return {
        "resisc": TaskDataLoader(cls_ds, 2, collate_fn=collate_cls,
                                 num_threads=1),
        "dior": TaskDataLoader(
            det_ds, 2, collate_fn=lambda s: collate_det(s, (64, 64), 12),
            num_threads=1),
        "potsdam": TaskDataLoader(
            seg_ds, 2, collate_fn=lambda s: collate_seg(s, 64),
            num_threads=1),
    }


class TestStrategies:
    def test_round_robin(self):
        loaders = make_loaders()
        s = strategies_map["round_robin"](loaders)
        assert [s() for _ in range(7)] == [0, 1, 2, 0, 1, 2, 0]

    def test_repeated_sequence(self):
        loaders = make_loaders()
        s = strategies_map["repeated_sequence"](loaders,
                                                sequence=[1, 2, 2, 0])
        assert [s() for _ in range(5)] == [1, 2, 2, 0, 1]

    def test_weighted_random_ratios(self):
        loaders = make_loaders()
        s = strategies_map["weighted_random"](loaders, p=[0, 1, 0], seed=1)
        assert all(s() == 1 for _ in range(50))

    def test_size_proportional_exhausts(self):
        loaders = make_loaders()
        s = strategies_map["size_proportional"](loaders, seed=0)
        assert s.should_exhaust_all_iterators
        draws = [s() for _ in range(600)]
        counts = np.bincount(draws, minlength=3) / 600
        # sizes 8/6/6 -> 0.4/0.3/0.3
        np.testing.assert_allclose(counts, [0.4, 0.3, 0.3], atol=0.08)

    def test_constant(self):
        loaders = make_loaders()
        s = strategies_map["constant"](loaders, idx=2)
        assert [s() for _ in range(3)] == [2, 2, 2]


class TestLoaders:
    def test_cls_batch_shapes(self):
        dl = make_loaders()["resisc"]
        b = next(iter(dl))
        assert b["img"].shape == (2, 32, 32, 3)
        assert b["gt_label"].shape == (2,)

    def test_det_batch_static(self):
        dl = make_loaders()["dior"]
        b = next(iter(dl))
        assert b["img"].shape == (2, 64, 64, 3)
        assert b["gt_bboxes"].shape == (2, 12, 4)
        assert b["gt_valid"].dtype == bool
        assert b["gt_valid"].any()

    def test_seg_batch(self):
        dl = make_loaders()["potsdam"]
        b = next(iter(dl))
        assert b["img"].shape == (2, 64, 64, 3)
        assert b["gt_semantic_seg"].shape == (2, 64, 64)

    def test_multi_loader_round_robin(self):
        loaders = make_loaders()
        s = strategies_map["round_robin"](loaders)
        ml = MultiDataLoader(loaders, s)
        it = iter(ml)
        tasks = [next(it)["task"] for _ in range(6)]
        assert tasks == ["cls", "det", "seg", "cls", "det", "seg"]
        names = [b["dataset_name"] for b in [next(it) for _ in range(3)]]
        assert names == ["resisc", "dior", "potsdam"]

    def test_multi_loader_reignites(self):
        """Non-exhaust strategies loop forever over small datasets."""
        loaders = make_loaders()
        s = strategies_map["round_robin"](loaders)
        ml = MultiDataLoader(loaders, s)
        it = iter(ml)
        for _ in range(30):   # > one epoch of each child
            next(it)

    def test_zero_batch_child_rejected_at_build(self):
        """A child whose dataset is smaller than its batch size (0 batches
        with drop_last) would silently starve its task on every draw —
        MultiDataLoader must fail loudly at construction instead."""
        loaders = make_loaders()
        loaders["potsdam"] = TaskDataLoader(
            SyntheticSegDataset(length=1, img_size=64), 2,
            collate_fn=lambda s: collate_seg(s, 64), num_threads=1)
        s = strategies_map["round_robin"](loaders)
        with pytest.raises(AssertionError, match="potsdam"):
            MultiDataLoader(loaders, s)

    def test_multi_loader_exhaust_all(self):
        loaders = make_loaders()
        s = strategies_map["size_proportional"](loaders, seed=0)
        ml = MultiDataLoader(loaders, s)
        n = sum(1 for _ in ml)
        # 4 + 3 + 3 batches total
        assert n == 10

    def test_exhaust_all_survives_skewed_strategy(self):
        """The epoch must deliver EVERY child's batches even when the
        strategy essentially never draws the unfinished child after the
        others end (reference redraws unboundedly,
        multi_data_loader.py:177-191 — a bounded retry would end the epoch
        early with high probability under a skewed SizeProportional).
        Constant is the extreme case: it never draws index 1 at all."""

        class ConstantExhaust:
            should_exhaust_all_iterators = True

            def __call__(self):
                return 0

        loaders = {k: v for k, v in make_loaders().items()
                   if k in ("resisc", "dior")}
        ml = MultiDataLoader(loaders, ConstantExhaust())
        names = [b["dataset_name"] for b in ml]
        # every batch of both children arrives: 4 cls + 3 det
        assert names.count("resisc") == 4
        assert names.count("dior") == 3
        # full epochs again on re-iteration
        assert sum(1 for _ in ml) == 7


class TestPipelines:
    def test_resize_keep_ratio(self):
        from rscotr_tpu.data.pipelines import Resize
        r = Resize(img_scale=(128, 64), keep_ratio=True)
        res = r({"img": np.zeros((100, 200, 3), np.float32)},
                np.random.default_rng(0))
        h, w = res["img"].shape[:2]
        assert w <= 128 and h <= 64
        assert abs(w / h - 2.0) < 0.05

    def test_resize_boxes(self):
        from rscotr_tpu.data.pipelines import Resize
        r = Resize(img_scale=(50, 50), keep_ratio=False)
        res = r({"img": np.zeros((100, 100, 3), np.float32),
                 "gt_bboxes": np.array([[10, 20, 30, 40]], np.float32)},
                np.random.default_rng(0))
        np.testing.assert_allclose(res["gt_bboxes"][0], [5, 10, 15, 20])

    def test_flip_boxes(self):
        from rscotr_tpu.data.pipelines import RandomFlip
        f = RandomFlip(prob=1.0)
        res = f({"img": np.zeros((10, 100, 3), np.float32),
                 "gt_bboxes": np.array([[10, 0, 30, 5]], np.float32)},
                np.random.default_rng(0))
        np.testing.assert_allclose(res["gt_bboxes"][0], [70, 0, 90, 5])

    def test_pad_seg_val(self):
        from rscotr_tpu.data.pipelines import Pad
        p = Pad(size=(8, 8), pad_val=0, seg_pad_val=5)
        res = p({"img": np.ones((5, 5, 3), np.float32),
                 "gt_semantic_seg": np.zeros((5, 5), np.int32)}, None)
        assert res["img"].shape == (8, 8, 3)
        assert (res["gt_semantic_seg"][6:] == 5).all()

    def test_normalize(self):
        from rscotr_tpu.data.pipelines import Normalize
        n = Normalize()
        res = n({"img": np.full((4, 4, 3), 123.675, np.float32)}, None)
        assert abs(float(res["img"][..., 0].mean())) < 1e-4

    def test_random_resized_crop(self):
        from rscotr_tpu.data.pipelines import RandomResizedCrop
        t = RandomResizedCrop(size=32)
        res = t({"img": np.zeros((64, 64, 3), np.float32)},
                np.random.default_rng(0))
        assert res["img"].shape == (32, 32, 3)

    def test_build_pipeline_from_reference_cfg(self):
        from rscotr_tpu.data.pipelines import build_pipeline
        cfgs = [
            dict(type="LoadImageFromFile"),
            dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
            dict(type="RandomFlip", flip_ratio=0.5),
            dict(type="Normalize"),
            dict(type="Pad", size_divisor=32),
            dict(type="DefaultFormatBundle"),
            dict(type="Collect", keys=["img"]),
        ]
        p = build_pipeline(cfgs)
        # FormatBundle/Collect skipped; LoadImageFromFile KEPT (datasets
        # emit img_path — see TestRealFileDatasets)
        assert len(p) == 5
        assert type(p[0]).__name__ == "LoadImageFromFile"


class TestMetrics:
    def test_accuracy(self):
        from rscotr_tpu.evaluation import top_k_accuracy
        scores = np.eye(4)
        labels = np.array([0, 1, 2, 0])
        m = top_k_accuracy(scores, labels, topk=(1,))
        assert m["accuracy_top-1"] == 75.0

    def test_seg_metrics_perfect(self):
        from rscotr_tpu.evaluation import evaluate_seg, intersect_and_union
        pred = np.array([[0, 1], [2, 5]])
        label = np.array([[0, 1], [2, 5]])
        r = intersect_and_union(pred, label, 3, ignore_index=5)
        m = evaluate_seg([r], metrics=("mIoU", "mFscore"))
        assert m["mIoU"] == 100.0
        assert m["mFscore"] == 100.0

    def test_seg_metrics_ignore(self):
        from rscotr_tpu.evaluation import intersect_and_union
        pred = np.array([[0, 0]])
        label = np.array([[5, 0]])   # first pixel ignored
        inter, union, _, lab = intersect_and_union(pred, label, 3, 5)
        assert inter.sum() == 1 and lab.sum() == 1

    def test_coco_map_perfect(self):
        from rscotr_tpu.evaluation import eval_map
        anns = [{"bboxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]],
                                    np.float32),
                 "labels": np.array([0, 1])}]
        dets = [[np.array([[0, 0, 10, 10, 0.9]], np.float32),
                 np.array([[20, 20, 40, 40, 0.8]], np.float32)]]
        m = eval_map(dets, anns, num_classes=2, iou_thrs=[0.5])
        assert m["bbox_mAP"] == 1.0

    def test_coco_map_fp(self):
        from rscotr_tpu.evaluation import eval_map
        anns = [{"bboxes": np.array([[0, 0, 10, 10]], np.float32),
                 "labels": np.array([0])}]
        # one hit + one miss at higher score
        dets = [[np.array([[50, 50, 60, 60, 0.95], [0, 0, 10, 10, 0.9]],
                          np.float32)]]
        m = eval_map(dets, anns, num_classes=1, iou_thrs=[0.5])
        assert 0.4 < m["bbox_mAP"] <= 0.6  # AP ~ 0.5 with FP ranked first

    def test_coco_map_vs_greedy_property(self):
        """Random case: AP in [0,1], more noise -> lower AP."""
        from rscotr_tpu.evaluation import eval_map
        rng = np.random.default_rng(0)
        anns, dets_good, dets_bad = [], [], []
        for _ in range(4):
            n = 5
            b = rng.uniform(0, 80, (n, 2))
            boxes = np.concatenate([b, b + 15], 1).astype(np.float32)
            anns.append({"bboxes": boxes, "labels": np.zeros(n, int)})
            good = np.concatenate(
                [boxes + rng.normal(0, 1, boxes.shape),
                 rng.uniform(0.5, 1, (n, 1))], 1).astype(np.float32)
            bad = np.concatenate(
                [boxes + rng.normal(0, 20, boxes.shape),
                 rng.uniform(0.5, 1, (n, 1))], 1).astype(np.float32)
            dets_good.append([good])
            dets_bad.append([bad])
        mg = eval_map(dets_good, anns, 1, [0.5])["bbox_mAP"]
        mb = eval_map(dets_bad, anns, 1, [0.5])["bbox_mAP"]
        assert 0 <= mb < mg <= 1.0


def test_prefetch_iterator_propagates_worker_errors():
    """A transfer_fn failure (e.g. device_put OOM) must surface as an
    error in the consumer, NOT as StopIteration — the runner treats
    exhaustion as a normal epoch end and would silently restart."""
    from rscotr_tpu.data.loader import PrefetchIterator

    def boom(x):
        raise ValueError("device exploded")

    it = PrefetchIterator(iter([1, 2, 3]), depth=2, transfer_fn=boom)
    with pytest.raises(RuntimeError, match="prefetch worker failed"):
        next(it)


def test_prefetch_iterator_transfer_fn_applied_in_order():
    from rscotr_tpu.data.loader import PrefetchIterator
    it = PrefetchIterator(iter([1, 2, 3]), depth=1,
                          transfer_fn=lambda x: x * 10)
    assert list(it) == [10, 20, 30]


class TestRealFileDatasets:
    """Regression for the real-data path: file-indexed datasets emit
    img_path and rely on LoadImageFromFile in the loader pipeline
    (previously build_pipeline skipped it, so any non-synthetic cls/det
    run crashed in collate on the missing 'img')."""

    def _make_cls_folder(self, root):
        from PIL import Image
        rng = np.random.default_rng(0)
        for cname in ("alpha", "beta"):
            d = root / cname
            d.mkdir(parents=True)
            for i in range(3):
                Image.fromarray(rng.integers(
                    0, 255, size=(24 + i, 30, 3)).astype(np.uint8)).save(
                    d / f"{i}.jpg")
        return str(root)

    def test_resisc_folder_end_to_end(self, tmp_path):
        from rscotr_tpu.data.datasets import ResiscDataset
        from rscotr_tpu.data.loader import TaskDataLoader
        from rscotr_tpu.data.loader import collate_cls
        from rscotr_tpu.data.pipelines import build_pipeline

        ds = ResiscDataset(self._make_cls_folder(tmp_path / "cls"))
        assert ds.CLASSES == ("alpha", "beta") and len(ds) == 6
        pipe = build_pipeline([
            dict(type="LoadImageFromFile"),
            dict(type="Resize", size=(16, 16), keep_ratio=False)])
        dl = TaskDataLoader(ds, 2, pipeline=pipe, collate_fn=collate_cls,
                            num_threads=2)
        batch = next(iter(dl))
        assert batch["img"].shape == (2, 16, 16, 3)
        assert batch["img"].dtype == np.float32
        assert batch["gt_label"].shape == (2,)
        assert float(batch["img"].std()) > 0  # real pixels, not zeros

    def test_coco_json_end_to_end(self, tmp_path):
        import json as _json
        from PIL import Image
        from rscotr_tpu.data.datasets import CocoDetDataset
        from rscotr_tpu.data.loader import TaskDataLoader, collate_det
        from rscotr_tpu.data.pipelines import build_pipeline

        rng = np.random.default_rng(1)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        images, annotations = [], []
        for i in range(2):
            Image.fromarray(rng.integers(
                0, 255, size=(40, 32, 3)).astype(np.uint8)).save(
                img_dir / f"im{i}.jpg")
            images.append({"id": i, "file_name": f"im{i}.jpg",
                           "width": 32, "height": 40})
            annotations.append({"id": i, "image_id": i, "category_id": 1,
                                "bbox": [2, 3, 10, 12], "iscrowd": 0,
                                "area": 120})
        ann = tmp_path / "ann.json"
        ann.write_text(_json.dumps({
            "images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "golffield"}]}))

        ds = CocoDetDataset(str(ann), str(img_dir))
        assert len(ds) == 2
        pipe = build_pipeline([
            dict(type="LoadImageFromFile"),
            dict(type="Resize", img_scale=(48, 48), keep_ratio=True)])
        dl = TaskDataLoader(
            ds, 2, pipeline=pipe,
            collate_fn=lambda s: collate_det(s, (48, 48), 5),
            num_threads=1)
        batch = next(iter(dl))
        assert batch["img"].shape == (2, 48, 48, 3)
        assert batch["gt_bboxes"].shape == (2, 5, 4)
        assert bool(batch["gt_valid"][:, 0].all())
        # boxes were rescaled by the pipeline (48/40 = 1.2 on y)
        assert float(batch["gt_bboxes"].max()) > 12
