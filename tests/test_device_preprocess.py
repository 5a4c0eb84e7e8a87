"""Device-side preprocessing: uint8 in, normalize (+ pad re-zero) on TPU.

Host path (pipeline Normalize -> f32 collate) and device path (stripped
Normalize -> uint8 collate -> device_normalize inside the step) must agree
within uint8 quantization (the reference also stores uint8 until
Normalize, so quantization is parity, not error)."""

import numpy as np

import jax.numpy as jnp

from rscotr_tpu.data.loader import collate_cls, collate_det
from rscotr_tpu.data.pipelines import (Normalize, split_normalize_cfg)
from rscotr_tpu.engine.train_step import device_normalize

MEAN = (123.675, 116.28, 103.53)
STD = (58.395, 57.12, 57.375)


def _samples(n=3, h=20, w=24):
    rng = np.random.default_rng(0)
    return [{"img": rng.uniform(0, 255, (h, w, 3)).astype(np.float32),
             "gt_label": int(i)} for i in range(n)]


def test_split_normalize_cfg():
    cfgs = [{"type": "RandomFlip", "prob": 0.5},
            {"type": "Normalize", "mean": list(MEAN), "std": list(STD)},
            {"type": "Pad", "size": (32, 32)}]
    rest, norm = split_normalize_cfg(cfgs)
    assert [c["type"] for c in rest] == ["RandomFlip", "Pad"]
    assert tuple(norm["mean"]) == MEAN


def test_device_normalize_matches_host():
    samples = _samples()
    host = [dict(s) for s in samples]
    norm = Normalize(mean=MEAN, std=STD)
    host = [norm(s) for s in host]
    want = collate_cls(host)["img"]

    u8 = collate_cls(samples)
    u8["img"] = np.clip(np.round(u8["img"]), 0, 255).astype(np.uint8)
    got = np.asarray(device_normalize(jnp.asarray(u8["img"]),
                                      (MEAN, STD)))
    # uint8 quantization bound: 0.5 / min(std)
    np.testing.assert_allclose(got, want, atol=0.5 / min(STD) + 1e-6)


def test_device_normalize_rezeros_padding():
    samples = [{"img": np.full((10, 12, 3), 200, np.float32),
                "gt_bboxes": np.zeros((0, 4), np.float32),
                "gt_labels": np.zeros((0,), np.int32)}]
    batch = collate_det(samples, bucket_hw=(16, 16), max_gt=4)
    batch["img"] = np.clip(np.round(batch["img"]), 0, 255).astype(np.uint8)
    out = np.asarray(device_normalize(
        jnp.asarray(batch["img"]), (MEAN, STD),
        jnp.asarray(batch["img_hw"])))
    assert np.all(out[0, 10:, :, :] == 0.0)
    assert np.all(out[0, :, 12:, :] == 0.0)
    assert np.all(np.abs(out[0, :10, :12]) > 0.1)


def test_float_input_passthrough():
    x = jnp.ones((1, 4, 4, 3), jnp.float32) * 0.5
    out = device_normalize(x, (MEAN, STD))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
