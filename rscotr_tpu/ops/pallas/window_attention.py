"""Pallas TPU kernel: fused Swin window attention.

Fuses QK^T + relative-position bias (+ shifted-window mask) + softmax + PV
for all (batch, window, head) triples — the north-star fused Swin attention
(BASELINE.json). The XLA einsum path in models/backbones/swin.py is the
correctness oracle; interpret-mode tests in tests/test_pallas.py.

Layout (round-2 fix of the round-1 head-dim waste): head_dim stays UNPADDED
(32 == the whole last array dim satisfies Mosaic's tiling rule — zero-padding
it to 128 quadrupled MXU work and memory traffic); window length n pads to
a sublane multiple with masked softmax. Each grid program processes a
``win_block`` of consecutive windows for one (batch, head) — batching
windows amortizes grid/DMA overhead over the tiny 49x49 attention problems
(Swin-T: 841 windows x 3 heads for an 800^2 det input).

MEASURED VERDICT (v5e, compiled via the remote relay, 2026-08): the kernel
LOSES to XLA's batched-einsum path on the full flagship MTL bench —
f32 71.7 -> 66.4 img/s, bf16 86.0 -> 78.3 img/s (cls 10.1 -> 16.4 ms) —
because n=49 pads to 56x128 tiles per program and XLA's fused
batched-GEMM schedule already amortizes the tiny problems better than a
per-(batch, head, window-block) grid can. ``fused_window_attn`` therefore
stays OFF in every config; the kernel remains parity-tested
(tests/test_pallas.py) as infrastructure for shapes where it could win
(larger windows / head counts).
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
            n_valid: int, win_block: int):
    # blocks: q/k/v (1, WG, 1, n, hd); bias (1, n, n); mask (WG, n, n)
    n = q_ref.shape[3]
    bias = bias_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    pad_mask = jnp.where(col < n_valid, 0.0, NEG)
    for w in range(win_block):
        q = q_ref[0, w, 0]
        k = k_ref[0, w, 0]
        v = v_ref[0, w, 0]
        s = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)
        s = s + bias + pad_mask
        if mask_ref is not None:
            s = s + mask_ref[w]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, w, 0] = jnp.dot(p.astype(v.dtype), v,
                                 preferred_element_type=jnp.float32
                                 ).astype(o_ref.dtype)


def window_attention_fused(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           rel_bias: jnp.ndarray,
                           shift_mask: Optional[jnp.ndarray] = None,
                           scale: Optional[float] = None,
                           win_block: int = 8,
                           interpret: bool = False) -> jnp.ndarray:
    """
    Args:
        q, k, v: (B, nW, H, n, hd) — per (image, window, head) tiles.
        rel_bias: (H, n, n) relative-position bias.
        shift_mask: (nW, n, n) additive mask or None.
        win_block: windows per grid program.
    Returns:
        (B, nW, H, n, hd)
    """
    B, nW, H, n, hd = q.shape
    scale = scale if scale is not None else hd ** -0.5
    n_pad = _round_up(n, 8)
    WG = max(1, min(win_block, nW))
    nWp = _round_up(nW, WG)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, nWp - nW), (0, 0),
                           (0, n_pad - n), (0, 0)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    bias_p = jnp.pad(rel_bias, ((0, 0), (0, n_pad - n), (0, n_pad - n)))

    qkv_spec = pl.BlockSpec((1, WG, 1, n_pad, hd),
                            lambda b, w, h: (b, w, h, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, n_pad, n_pad), lambda b, w, h: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
    args = [qp, kp, vp, bias_p]
    if shift_mask is not None:
        mask_p = jnp.pad(shift_mask,
                         ((0, nWp - nW), (0, n_pad - n), (0, n_pad - n)))
        in_specs.append(pl.BlockSpec((WG, n_pad, n_pad),
                                     lambda b, w, h: (w, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask_p)
        kern = functools.partial(_kernel, scale=scale, n_valid=n,
                                 win_block=WG)
    else:
        def kern(q_ref, k_ref, v_ref, bias_ref, o_ref):
            _kernel(q_ref, k_ref, v_ref, bias_ref, None, o_ref,
                    scale=scale, n_valid=n, win_block=WG)

    out = pl.pallas_call(
        kern,
        grid=(B, nWp // WG, H),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, WG, 1, n_pad, hd),
                               lambda b, w, h: (b, w, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nWp, H, n_pad, hd), q.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :nW, :, :n, :]
