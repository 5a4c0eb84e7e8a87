"""Smoke tests for the offline tools (the reference's tools/ long tail):
seg tile stitcher, class-color converter, confusion-matrix pair, and the
featmap renderer. All hermetic (tiny arrays on disk, no model, no device);
CLI entry points are exercised via their main() with patched argv so the
argparse surface stays covered.

Reference counterparts: /root/reference/tools/seg_puzzles/
puzzles_potsdam.py, tools/seg_puzzles_and_cvt/cvt_6class_to_5class.py,
tools/confusion_matrix/{get_cls_confusion_matrix,plot_confusion_matrix}.py,
tools/featmap_vis/draw_featmap.py.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestSegPuzzles:
    def test_stitch_roundtrip(self, tmp_path):
        puz = _load("tools/seg_puzzles/puzzles_potsdam.py", "puz")
        rng = np.random.default_rng(0)
        full = rng.integers(0, 255, size=(64, 96, 3)).astype(np.uint8)
        td = tmp_path / "tiles"
        td.mkdir()
        # 32x32 tiles with edge overlap, reference naming scheme
        for u in (0, 32):
            for l in (0, 32, 64):
                tile = full[u:u + 32, l:l + 32]
                Image.fromarray(tile).save(
                    td / f"top_potsdam_2_10_{l}_{u}_{l + 32}_{u + 32}.png")
        scenes = puz.collect_puzzles_info(str(td))
        assert list(scenes) == ["top_potsdam_2_10"]
        out = puz.get_whole_fig(scenes["top_potsdam_2_10"])
        np.testing.assert_array_equal(out, full)

    def test_cvt_6class_to_5class(self, tmp_path):
        cvt = _load("tools/seg_puzzles_and_cvt/cvt_6class_to_5class.py",
                    "cvt")
        img = np.zeros((4, 4, 3), np.uint8)
        img[0, 0] = (255, 0, 0)     # clutter red -> remapped
        img[1, 1] = (255, 0, 128)   # not pure red -> untouched
        out = cvt.convert(img)
        assert tuple(out[0, 0]) == (255, 255, 0)
        assert tuple(out[1, 1]) == (255, 0, 128)

        ind = tmp_path / "in"
        outd = tmp_path / "out"
        ind.mkdir()
        Image.fromarray(img).save(ind / "a.png")
        old = sys.argv
        sys.argv = ["cvt", str(ind), str(outd)]
        try:
            cvt.main()
        finally:
            sys.argv = old
        got = np.asarray(Image.open(outd / "a.png"))
        assert tuple(got[0, 0]) == (255, 255, 0)


class TestConfusionMatrixTools:
    def test_build_and_plot(self, tmp_path):
        get = _load("tools/confusion_matrix/get_cls_confusion_matrix.py",
                    "getcm")
        gt = np.array([0, 1, 2, 2, 1], np.int64)
        pred = np.array([0, 1, 2, 1, 1], np.int64)
        np.save(tmp_path / "gt.npy", gt)
        np.save(tmp_path / "pred.npy", pred)
        cm_path = tmp_path / "cm.npy"
        old = sys.argv
        sys.argv = ["getcm", str(tmp_path / "gt.npy"),
                    str(tmp_path / "pred.npy"), "--out", str(cm_path)]
        try:
            get.main()
        finally:
            sys.argv = old
        cm = np.load(cm_path)
        assert cm.shape == (3, 3)
        assert cm[2, 1] == 1 and np.trace(cm) == 4

        plot = _load("tools/confusion_matrix/plot_confusion_matrix.py",
                     "plotcm")
        pytest.importorskip("matplotlib")
        png = tmp_path / "cm.png"
        classes_txt = tmp_path / "classes.txt"
        classes_txt.write_text("a\nb\nc\n")
        old = sys.argv
        sys.argv = ["plotcm", str(cm_path), "--out", str(png),
                    "--classes", str(classes_txt)]
        try:
            plot.main()
        finally:
            sys.argv = old
        assert png.exists() and png.stat().st_size > 0


class TestBenchmarkCLI:
    def test_cls_train_with_cfg_options(self):
        """tools/benchmark.py end-to-end on the tiny synthetic config:
        --cfg-options reaches the model build (backbone remat on) and the
        report carries timing / FLOPs / compile-time temp-memory keys."""
        bench = _load("tools/benchmark.py", "benchtool")
        report = bench.main([
            os.path.join(ROOT, "configs/multi/MTL_tiny_synthetic.py"),
            "--tasks", "cls", "--train", "--iters", "1", "--warmup", "1",
            "--cfg-options", "model.backbone.with_cp=True"])
        entry = report["tasks"]["cls"]
        for key in ("infer_ms", "infer_temp_mb", "train_ms",
                    "train_temp_mb"):
            assert key in entry
        assert entry["train_ms"] > 0


class TestProbeH2dWindow:
    def test_reports_all_row_buckets(self):
        probe = _load("tools/probe_h2d_window.py", "probe_h2d")
        report = probe.main(["--reps", "1", "--batch", "1",
                             "--rows", "16", "8"])
        assert set(report) == {16, 8}
        for v in report.values():
            assert v["s_per_dispatch"] > 0 and v["MB_per_s"] > 0


class TestDrawFeatmap:
    def test_reductions_and_montage(self):
        dfm = _load("tools/featmap_vis/draw_featmap.py", "dfm")
        rng = np.random.default_rng(1)
        feat = rng.normal(size=(8, 8, 12)).astype(np.float32)
        img = rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
        out = dfm.draw_featmap(feat, img, channel_reduction="squeeze_mean")
        assert out.shape == (32, 32, 3) and out.dtype == np.uint8
        out = dfm.draw_featmap(feat, img, channel_reduction="select_max")
        assert out.shape == (32, 32, 3)
        montage = dfm.draw_featmap(feat, img, channel_reduction=None,
                                   topk=4, arrangement=(2, 2))
        assert montage.ndim == 3 and montage.shape[2] == 3


class TestBenchSteadyState:
    def test_steady_state_mix_drops_compiles_per_task(self):
        bench = _load("bench.py", "bench_mod")
        recs = []
        # det's compile record must not bias the mix toward cls/seg
        for t, times in [("cls", [0.17, 0.18, 0.17]),
                         ("det", [120.0, 0.32, 0.32, 0.32]),
                         ("seg", [28.0, 0.15, 0.15])]:
            for x in times:
                recs.append({"step": 1, f"{t}.d.loss": 1.0, "time": x})
        mix, means = bench.steady_state_mix(recs)
        assert abs(means["det"] - 0.32) < 1e-9
        assert abs(mix - (0.17333333 + 0.32 + 0.15)) < 1e-6

    def test_steady_state_mix_partial_tasks(self):
        bench = _load("bench.py", "bench_mod2")
        recs = [{"step": 1, "cls.d.loss": 1.0, "time": 0.1}]
        mix, means = bench.steady_state_mix(recs)
        assert mix is None and list(means) == ["cls"]

    def test_steady_state_mix_all_compile_falls_back(self):
        bench = _load("bench.py", "bench_mod3")
        recs = [{"step": 1, f"{t}.d.loss": 1.0, "time": 60.0}
                for t in ("cls", "det", "seg")]
        mix, means = bench.steady_state_mix(recs)
        # nothing under the cutoff -> raw means (still a number, honest
        # for a cold-cache run)
        assert abs(mix - 180.0) < 1e-9
