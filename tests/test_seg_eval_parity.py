"""Seg-eval resize parity vs the reference's torch path.

The reference resizes seg LOGITS bilinearly (align_corners=False) to
``ori_shape`` and argmaxes AFTER the resize
(/root/reference/models/multi/multitask_learner.py:171-195,217-227) — on
boundary-heavy maps this moves mIoU/mFscore at the same order as the
parity budget. ``_resize_bilinear_np`` must therefore match
``F.interpolate(mode='bilinear', align_corners=False)`` exactly, and the
strided-eval seg branch must argmax after the resize.
"""

import numpy as np
import pytest

from rscotr_tpu.engine.test import _resize_bilinear_np, _strided_test


class TestBilinearOracle:
    @pytest.mark.parametrize("src,dst", [
        ((16, 16), (37, 41)),    # upsample, non-integer ratio
        ((32, 48), (17, 13)),    # downsample
        ((20, 20), (20, 20)),    # identity
        ((7, 9), (14, 18)),      # exact 2x
    ])
    def test_matches_torch_interpolate(self, src, dst):
        import torch
        import torch.nn.functional as F
        rng = np.random.default_rng(0)
        C = 5
        x = rng.standard_normal((*src, C)).astype(np.float32)
        got = _resize_bilinear_np(x, dst)
        want = F.interpolate(
            torch.from_numpy(x).permute(2, 0, 1)[None],
            size=dst, mode="bilinear", align_corners=False
        )[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_boundary_heavy_argmax_matches_reference_order(self):
        """Checkerboard logits: resize-then-argmax (reference) differs from
        argmax-then-nearest-resize at boundaries; our eval must take the
        reference branch."""
        import torch
        import torch.nn.functional as F
        H = W = 16
        h = w = 23
        yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        board = ((yy // 2 + xx // 2) % 2).astype(np.float32)
        logits = np.stack([board, 1.0 - board], -1)  # (H, W, 2)
        ref = F.interpolate(
            torch.from_numpy(logits).permute(2, 0, 1)[None],
            size=(h, w), mode="bilinear", align_corners=False
        )[0].permute(1, 2, 0).numpy().argmax(-1)
        got = _resize_bilinear_np(logits, (h, w)).argmax(-1)
        np.testing.assert_array_equal(got, ref)


class _FakeLoader:
    """One-batch loader: batch dict prepared up front."""

    def __init__(self, batch, task="seg", classes=("a", "b")):
        self.batch = batch
        self.batch_size = len(batch["img"])
        self.dataset = type("D", (), {"task": task, "CLASSES": classes})()

    def __iter__(self):
        return iter([self.batch])


class TestEvalUsesLogitsPath:
    def test_strided_seg_argmaxes_after_resize(self):
        """End-to-end through _strided_test with a fake logits step: the
        result equals torch resize->argmax, not nearest-label-resize."""
        import torch
        import torch.nn.functional as F
        rng = np.random.default_rng(1)
        B, H, W, C = 1, 12, 12, 3
        logits = rng.standard_normal((B, H, W, C)).astype(np.float32)
        img = np.zeros((B, H, W, 3), np.float32)
        batch = {"img": img,
                 "img_hw": np.asarray([[10, 11]], np.int32),
                 "ori_hw": np.asarray([[19, 21]], np.int32)}

        steps = {"seg": lambda p, im: logits.argmax(-1),
                 "seg_logits": lambda p, im: logits}
        res = _strided_test(steps, None, {"d": _FakeLoader(batch)})
        got = res["d"][0][1]

        crop = logits[0, :10, :11]
        want = F.interpolate(
            torch.from_numpy(crop).permute(2, 0, 1)[None],
            size=(19, 21), mode="bilinear", align_corners=False
        )[0].permute(1, 2, 0).numpy().argmax(-1)
        np.testing.assert_array_equal(got, want)
        assert got.shape == (19, 21)

    def test_strided_seg_fast_path_device_argmax(self):
        """img_hw == padded == ori_shape (Potsdam's uniform tiles): the
        eval loop must take the device-argmax fast path (1 MB int32 D2H
        instead of the Q-channel logits volume — PERF.md round 4) and
        produce the SAME labels the logits path would."""
        rng = np.random.default_rng(2)
        B, H, W, C = 1, 12, 12, 3
        logits = rng.standard_normal((B, H, W, C)).astype(np.float32)
        img = np.zeros((B, H, W, 3), np.float32)
        batch = {"img": img,
                 "img_hw": np.asarray([[H, W]], np.int32),
                 "ori_hw": np.asarray([[H, W]], np.int32)}
        called = {"seg": 0, "seg_logits": 0}

        def seg_step(p, im):
            called["seg"] += 1
            return logits.argmax(-1)

        def logits_step(p, im):
            called["seg_logits"] += 1
            return logits

        steps = {"seg": seg_step, "seg_logits": logits_step}
        res = _strided_test(steps, None, {"d": _FakeLoader(batch)})
        got = res["d"][0][1]
        assert called == {"seg": 1, "seg_logits": 0}
        np.testing.assert_array_equal(got, logits[0].argmax(-1))
