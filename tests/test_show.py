"""Painted eval outputs (--show/--show-dir path of tools/test.py).

Reference: /root/reference/tools/test.py:54-56,184 routes eval outputs
through mm* ``single_gpu_test(show, out_dir)`` -> ``MTL.show_result``
(/root/reference/models/multi/multitask_learner.py:355-540). Here the
equivalent ``save_eval_visualizations`` paints per-task PNGs from the eval
engine's raw result dict — hermetic (synthetic datasets, fake results).
"""

import os

import numpy as np

from rscotr_tpu.utils import save_eval_visualizations


def _datasets():
    from rscotr_tpu.data.datasets import (SyntheticClsDataset,
                                          SyntheticDetDataset,
                                          SyntheticSegDataset)
    cls_ds = SyntheticClsDataset(length=2, img_size=32, num_classes=3)
    det_ds = SyntheticDetDataset(length=2, img_size=64, num_classes=4)
    seg_ds = SyntheticSegDataset(length=2, img_size=32, num_classes=5)
    return {"resisc": cls_ds, "dior": det_ds, "potsdam": seg_ds}


def _fake_results(datasets):
    rng = np.random.default_rng(0)
    res = {}
    res["resisc"] = [rng.dirichlet(np.ones(3)).astype(np.float32)
                     for _ in range(2)]
    det = []
    for _ in range(2):
        per_class = [np.asarray([[2, 2, 20, 20, 0.9]], np.float32)] + \
            [np.zeros((0, 5), np.float32)] * 3
        det.append(per_class)
    res["dior"] = det
    res["potsdam"] = [rng.integers(0, 5, (32, 32)).astype(np.int32)
                      for _ in range(2)]
    return res


class TestSaveEvalVisualizations:
    def test_paints_all_tasks(self, tmp_path):
        datasets = _datasets()
        results = _fake_results(datasets)
        show_dir = str(tmp_path / "painted")
        n = save_eval_visualizations(datasets, results, show_dir,
                                     score_thr=0.3)
        assert n == 6
        from PIL import Image
        for name, ds in datasets.items():
            for i in range(2):
                p = os.path.join(show_dir, name, f"{i}.png")
                assert os.path.isfile(p), p
                im = Image.open(p)
                assert im.size[0] > 0

    def test_det_threshold_filters_boxes(self, tmp_path):
        """A box under the threshold leaves the raw image unpainted."""
        datasets = {"dior": _datasets()["dior"]}
        low = {"dior": [[np.asarray([[2, 2, 20, 20, 0.1]], np.float32)] +
                        [np.zeros((0, 5), np.float32)] * 3]}
        hi_dir, lo_dir = str(tmp_path / "hi"), str(tmp_path / "lo")
        save_eval_visualizations(datasets, low, lo_dir, score_thr=0.3)
        hi = {"dior": [[np.asarray([[2, 2, 20, 20, 0.9]], np.float32)] +
                       [np.zeros((0, 5), np.float32)] * 3]}
        save_eval_visualizations(datasets, hi, hi_dir, score_thr=0.3)
        from PIL import Image
        a = np.asarray(Image.open(os.path.join(lo_dir, "dior", "0.png")))
        b = np.asarray(Image.open(os.path.join(hi_dir, "dior", "0.png")))
        assert not np.array_equal(a, b)

    def test_cli_flag_surface(self):
        """tools/test.py exposes --show/--show-dir (reference test.py:54-56)."""
        import importlib.util
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "tools_test", os.path.join(root, "tools", "test.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        args = mod.parse_args(["cfg.py", "ckpt", "--show",
                               "--show-dir", "/tmp/x",
                               "--show-score-thr", "0.5"])
        assert args.show and args.show_dir == "/tmp/x"
        assert args.show_score_thr == 0.5
