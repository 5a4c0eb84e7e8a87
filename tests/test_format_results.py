"""--format-only submission dumps (reference tools/test.py:44-47,206-208).

CocoDataset writes a COCO detection-results json (xyxy -> xywh, labels
mapped back to the annotation file's category ids); PotsdamDataset writes
per-tile label PNGs that round-trip through its own loader and feed the
seg_puzzles stitcher; datasets without a submission format fall back to a
raw pickle.
"""

import json
import os

import numpy as np


def _coco_ann(path):
    ann = {
        "images": [{"id": 10, "file_name": "a.jpg",
                    "width": 64, "height": 64},
                   {"id": 11, "file_name": "b.jpg",
                    "width": 64, "height": 64}],
        "annotations": [
            {"id": 0, "image_id": 10, "category_id": 7,
             "bbox": [1, 2, 10, 12], "iscrowd": 0, "area": 120},
            {"id": 1, "image_id": 11, "category_id": 9,
             "bbox": [4, 4, 8, 8], "iscrowd": 0, "area": 64},
        ],
        "categories": [{"id": 7, "name": "ship"}, {"id": 9, "name": "car"}],
    }
    with open(path, "w") as f:
        json.dump(ann, f)


class TestCocoFormatResults:
    def test_submission_json(self, tmp_path):
        from rscotr_tpu.data.datasets import CocoDetDataset
        ann = str(tmp_path / "ann.json")
        _coco_ann(ann)
        ds = CocoDetDataset(ann, str(tmp_path), classes=["ship", "car"],
                            filter_empty_gt=False)
        results = [
            # image 10: one ship det, no car
            [np.asarray([[5.0, 6.0, 15.0, 26.0, 0.8]], np.float32),
             np.zeros((0, 5), np.float32)],
            # image 11: one car det
            [np.zeros((0, 5), np.float32),
             np.asarray([[0.0, 0.0, 8.0, 4.0, 0.5]], np.float32)],
        ]
        paths = ds.format_results(results, str(tmp_path / "fmt"))
        with open(paths[0]) as f:
            dets = json.load(f)
        assert len(dets) == 2
        d0 = next(d for d in dets if d["image_id"] == 10)
        assert d0["category_id"] == 7          # label 0 -> 'ship' -> id 7
        assert d0["bbox"] == [5.0, 6.0, 10.0, 20.0]   # xyxy -> xywh
        assert abs(d0["score"] - 0.8) < 1e-6
        d1 = next(d for d in dets if d["image_id"] == 11)
        assert d1["category_id"] == 9


class TestPotsdamFormatResults:
    def test_label_png_roundtrip(self, tmp_path):
        from PIL import Image
        from rscotr_tpu.data.datasets import PotsdamDataset
        img_dir = tmp_path / "img"
        ann_dir = tmp_path / "ann"
        img_dir.mkdir()
        ann_dir.mkdir()
        rng = np.random.default_rng(0)
        for name in ("t_0_0.png", "t_0_1.png"):
            Image.fromarray(rng.integers(
                0, 255, (16, 16, 3)).astype(np.uint8)).save(img_dir / name)
            Image.fromarray(rng.integers(
                1, 7, (16, 16)).astype(np.uint8)).save(ann_dir / name)
        ds = PotsdamDataset(img_dir=str(img_dir), ann_dir=str(ann_dir))
        preds = [rng.integers(0, 5, (16, 16)).astype(np.int32)
                 for _ in range(2)]
        out = tmp_path / "fmt"
        paths = ds.format_results(preds, str(out))
        assert sorted(os.path.basename(p) for p in paths) == \
            ["t_0_0.png", "t_0_1.png"]
        # written files round-trip through the SAME loader (the +1 shift
        # undoes reduce_zero_label)
        ds2 = PotsdamDataset(img_dir=str(img_dir), ann_dir=str(out))
        for i in range(2):
            np.testing.assert_array_equal(
                ds2[i]["gt_semantic_seg"], preds[i])

    def test_fallback_pickle(self, tmp_path):
        import pickle
        from rscotr_tpu.data.datasets import SyntheticClsDataset
        ds = SyntheticClsDataset(length=2, img_size=8, num_classes=3)
        paths = ds.format_results([np.ones(3), np.ones(3)], str(tmp_path))
        with open(paths[0], "rb") as f:
            raw = pickle.load(f)
        assert len(raw) == 2


class TestTestCliFlagSurface:
    def test_reference_flags_accepted(self):
        """tools/test.py accepts the reference's full flag set
        (/root/reference/tools/test.py:27-81)."""
        import importlib.util
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "tools_test_fmt", os.path.join(root, "tools", "test.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        args = mod.parse_args([
            "cfg.py", "ckpt", "--work-dir", "/tmp/wd", "--eval", "bbox",
            "--format-only", "--launcher", "none", "--gpu-id", "0",
            "--gpu-collect", "--tmpdir", "/tmp/t", "--local_rank", "0"])
        assert args.work_dir == "/tmp/wd"
        assert args.eval == ["bbox"] and args.format_only
