"""bf16 compute-dtype plumbing: ``model.compute_dtype='bfloat16'`` switches
every module's activation/matmul dtype while params stay f32 (flax
param_dtype default) — the TPU-natural equivalent of the reference's
optional fp16 AMP (SURVEY.md §2b fp16 row).

Checks: (a) the same f32 params drive both variants (identical pytrees),
(b) every task forward runs and stays finite in bf16, (c) outputs track
the f32 model within bf16 resolution on a tiny model."""

import copy

import numpy as np

import jax
import jax.numpy as jnp

from rscotr_tpu.models import build_model

from test_train_smoke import TINY_MODEL_CFG


def _build_pair():
    f32 = build_model(copy.deepcopy(TINY_MODEL_CFG))
    cfg16 = copy.deepcopy(TINY_MODEL_CFG)
    cfg16["compute_dtype"] = "bfloat16"
    b16 = build_model(cfg16)
    return f32, b16


def _init_args(rng):
    cls_img = jax.random.normal(rng, (1, 64, 64, 3), jnp.float32)
    det_img = jax.random.normal(rng, (1, 64, 64, 3), jnp.float32)
    det_hw = jnp.asarray([[64, 64]], jnp.int32)
    seg_img = jax.random.normal(rng, (1, 64, 64, 3), jnp.float32)
    return dict(cls_img=cls_img, det_img=det_img, det_img_hw=det_hw,
                seg_img=seg_img)


def test_bf16_params_identical_and_outputs_track_f32():
    f32, b16 = _build_pair()
    rng = jax.random.key(0)
    args = _init_args(rng)
    p32 = f32.init(rng, **args)
    p16 = b16.init(rng, **args)
    # params must be the same pytree (f32 both ways; bf16 is compute-only)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), p32, p16)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(p16))

    out32 = f32.apply(p32, args["cls_img"], deterministic=True,
                      method=f32.forward_cls)
    out16 = b16.apply(p32, args["cls_img"], deterministic=True,
                      method=b16.forward_cls)
    assert out16.dtype == out32.dtype == jnp.float32  # logits back in f32
    assert np.isfinite(np.asarray(out16)).all()
    # bf16 has ~3 decimal digits; logits of a tiny random model stay close
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               atol=0.15, rtol=0.1)


def test_bf16_det_seg_forward_finite():
    f32, b16 = _build_pair()
    rng = jax.random.key(1)
    args = _init_args(rng)
    params = b16.init(rng, **args)

    cls_logits, coords, _, _ = b16.apply(
        params, args["det_img"], args["det_img_hw"], None, None, None,
        deterministic=True, method=b16.forward_det)
    assert np.isfinite(np.asarray(cls_logits)).all()
    assert np.isfinite(np.asarray(coords)).all()

    seg_out = b16.apply(params, args["seg_img"], deterministic=True,
                        method=b16.forward_seg)
    assert np.isfinite(np.asarray(seg_out)).all()
