"""Pallas TPU kernel: fused Swin window attention.

Fuses QK^T + relative-position bias (+ shifted-window mask) + softmax + PV
for all (batch, window, head) triples in one kernel — the north-star fused
Swin attention (BASELINE.json). One grid program handles one (b, w, h)
triple; window length and head dim are padded to TPU tile boundaries with
masked softmax so padding rows/cols are inert.

The XLA einsum path in models/backbones/swin.py is the correctness oracle;
this kernel is dispatched for inference-shaped calls on TPU and validated
in interpreter mode on CPU (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, scale: float,
            n_valid: int):
    # blocks: q/k/v (1,1,1,n,hd); bias (1,n,n); mask (1,n,n)
    q = q_ref[0, 0, 0]
    k = k_ref[0, 0, 0]
    v = v_ref[0, 0, 0]
    n = q.shape[0]
    s = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)
    s = s + bias_ref[0]
    if mask_ref is not None:
        s = s + mask_ref[0]
    # mask padded key columns
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    s = jnp.where(col < n_valid, s, NEG)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0, 0] = jnp.dot(p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32
                             ).astype(o_ref.dtype)


def window_attention_fused(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           rel_bias: jnp.ndarray,
                           shift_mask: Optional[jnp.ndarray] = None,
                           scale: Optional[float] = None,
                           interpret: bool = False) -> jnp.ndarray:
    """
    Args:
        q, k, v: (B, nW, H, n, hd) — per (image, window, head) tiles.
        rel_bias: (H, n, n) relative-position bias.
        shift_mask: (nW, n, n) additive mask or None.
    Returns:
        (B, nW, H, n, hd)
    """
    B, nW, H, n, hd = q.shape
    scale = scale if scale is not None else hd ** -0.5
    n_pad = _round_up(n, 8)
    hd_pad = _round_up(hd, 128)

    def pad(x, target_n, target_hd):
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0),
                           (0, target_n - n), (0, target_hd - hd)))

    qp = pad(q, n_pad, hd_pad)
    kp = pad(k, n_pad, hd_pad)
    vp = pad(v, n_pad, hd_pad)
    bias_p = jnp.pad(rel_bias, ((0, 0), (0, n_pad - n), (0, n_pad - n)))

    qkv_spec = pl.BlockSpec((1, 1, 1, n_pad, hd_pad),
                            lambda b, w, h: (b, w, h, 0, 0))
    bias_spec = pl.BlockSpec((1, n_pad, n_pad), lambda b, w, h: (h, 0, 0))
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
    args = [qp, kp, vp, bias_p]
    if shift_mask is not None:
        mask_p = jnp.pad(shift_mask,
                         ((0, 0), (0, n_pad - n), (0, n_pad - n)))
        in_specs.append(pl.BlockSpec((1, n_pad, n_pad),
                                     lambda b, w, h: (w, 0, 0)))
        args.append(mask_p)
        kern = functools.partial(_kernel, scale=scale, n_valid=n)
    else:
        def kern(q_ref, k_ref, v_ref, bias_ref, o_ref):
            _kernel(q_ref, k_ref, v_ref, bias_ref, None, o_ref,
                    scale=scale, n_valid=n)

    out = pl.pallas_call(
        kern,
        grid=(B, nW, H),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 1, n_pad, hd_pad),
                               lambda b, w, h: (b, w, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nW, H, n_pad, hd_pad), q.dtype),
        interpret=interpret,
    )(*args)
    return out[..., :n, :hd]
