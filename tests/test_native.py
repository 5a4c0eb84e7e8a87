"""Native (C++) eval core vs numpy oracle."""

import numpy as np
import pytest

from rscotr_tpu.evaluation import eval_map, intersect_and_union
from rscotr_tpu.evaluation.native import (load_native, seg_confusion_native)


def _random_case(seed, n_img=6, n_cls=3):
    rng = np.random.default_rng(seed)
    anns, dets = [], []
    for _ in range(n_img):
        n = int(rng.integers(0, 8))
        b = rng.uniform(0, 80, (n, 2))
        boxes = np.concatenate([b, b + rng.uniform(5, 20, (n, 2))],
                               1).astype(np.float32)
        anns.append({"bboxes": boxes,
                     "labels": rng.integers(0, n_cls, n)})
        per_class = []
        for c in range(n_cls):
            m = int(rng.integers(0, 10))
            db = rng.uniform(0, 80, (m, 2))
            d = np.concatenate(
                [db, db + rng.uniform(5, 20, (m, 2)),
                 rng.uniform(0, 1, (m, 1))], 1).astype(np.float32)
            # half the detections loosely track a GT box
            for k in range(min(m, len(boxes))):
                if rng.uniform() < 0.5:
                    d[k, :4] = boxes[k % len(boxes)] + \
                        rng.normal(0, 2, 4)
            per_class.append(d)
        dets.append(per_class)
    return dets, anns


needs_native = pytest.mark.skipif(load_native() is None,
                                  reason="native lib unavailable")


@needs_native
class TestNativeCocoEval:
    @pytest.mark.parametrize("seed", range(4))
    def test_matches_numpy(self, seed):
        dets, anns = _random_case(seed)
        m_native = eval_map(dets, anns, 3, [0.5, 0.75], use_native=True)
        m_numpy = eval_map(dets, anns, 3, [0.5, 0.75], use_native=False)
        for k in m_numpy:
            np.testing.assert_allclose(m_native[k], m_numpy[k], atol=1e-6,
                                       err_msg=k)


@needs_native
class TestNativeSegConfusion:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        pred = rng.integers(0, 7, (64, 64)).astype(np.int32)
        label = rng.integers(0, 6, (64, 64)).astype(np.int32)
        want = intersect_and_union(pred, label, 5, ignore_index=5)
        got = seg_confusion_native(pred, label, 5, ignore_index=5)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)


class TestNativeImageDecode:
    """csrc/image_core.cpp vs PIL (same libjpeg/libpng -> bit-exact)."""

    def _png_bytes(self, arr):
        import io
        from PIL import Image
        b = io.BytesIO()
        Image.fromarray(arr).save(b, format="PNG")
        return b.getvalue()

    def test_png_exact_and_gray_to_rgb(self):
        from rscotr_tpu.data.native_image import imdecode, load_native
        if load_native() is None:
            pytest.skip("native image lib unavailable")
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, size=(37, 53, 3)).astype(np.uint8)
        np.testing.assert_array_equal(imdecode(self._png_bytes(img)), img)
        gray = imdecode(self._png_bytes(img[:, :, 0]))
        assert gray.shape == (37, 53, 3)
        np.testing.assert_array_equal(gray[:, :, 0], img[:, :, 0])

    def test_jpeg_matches_pil(self):
        import io
        from PIL import Image
        from rscotr_tpu.data.native_image import imdecode, load_native
        if load_native() is None:
            pytest.skip("native image lib unavailable")
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, size=(64, 48, 3)).astype(np.uint8)
        b = io.BytesIO()
        Image.fromarray(img).save(b, format="JPEG", quality=90)
        jb = b.getvalue()
        pil = np.asarray(Image.open(io.BytesIO(jb)).convert("RGB"))
        np.testing.assert_array_equal(imdecode(jb), pil)

    def test_garbage_returns_none(self):
        from rscotr_tpu.data.native_image import imdecode
        assert imdecode(b"definitely not an image") is None
        assert imdecode(b"") is None

    def test_load_image_pipeline_uses_native(self, tmp_path):
        """LoadImageFromFile (kept by build_pipeline — datasets emit
        img_path) produces identical output with and without the native
        decoder (PIL fallback parity), and passes through samples that
        already carry a decoded img (inference_one_img's raw inputs)."""
        import os
        from PIL import Image
        from rscotr_tpu.data.pipelines import build_pipeline, run_pipeline
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, size=(20, 30, 3)).astype(np.uint8)
        p = str(tmp_path / "x.png")
        Image.fromarray(img).save(p)
        pipe = build_pipeline([dict(type="LoadImageFromFile")])
        assert len(pipe) == 1  # not skipped
        res = run_pipeline(pipe, {"img_path": p}, np.random.default_rng(0))
        np.testing.assert_array_equal(res["img"], img.astype(np.float32))
        assert res["ori_shape"] == (20, 30, 3)
        os.environ["RSCOTR_NO_NATIVE_IMDECODE"] = "1"
        try:
            res2 = run_pipeline(pipe, {"img_path": p},
                                np.random.default_rng(0))
            np.testing.assert_array_equal(res2["img"], res["img"])
        finally:
            del os.environ["RSCOTR_NO_NATIVE_IMDECODE"]
        # pass-through for already-decoded samples
        raw = {"img": img.astype(np.float32)}
        assert run_pipeline(pipe, raw, None)["img"] is raw["img"]
