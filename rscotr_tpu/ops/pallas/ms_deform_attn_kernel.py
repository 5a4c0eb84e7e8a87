"""Pallas TPU kernel: fused multi-scale deformable attention forward.

Replaces the mmcv CUDA op ``ms_deform_attn_forward`` (the reference's
hottest kernel — shared encoder, DINO decoder cross-attn, pixel decoders;
/root/reference/configs/multi/MTL_slvlcls_...py:40,87-90) with a TPU-native
formulation:

1. an XLA prologue turns sampling locations into FLAT corner indices and
   folds bilinear fraction x border validity x attention weight into one
   per-corner weight (K = num_levels * num_points * 4 corners per query);
2. the Pallas kernel grids over (batch, head, query-block), keeps the whole
   per-head value table (Nv, D) resident in VMEM across query blocks
   (constant index map -> no re-DMA), performs ONE hardware gather of all
   K corners for a TQ-query block and reduces with the folded weights.

The backward pass is the VJP of the XLA gather formulation
(``_ms_deform_attn_xla`` — autodiff provides the scatter-add into value
grads and the bilinear-fraction grads into sampling locations); the
forward kernel and the XLA path are numerically interchangeable, so
mixing them across fwd/bwd is exact up to float reassociation.

VMEM budget per program (flagship det encoder: Nv~13.3k, D=32, K=64,
TQ=Nvp/K=208): value 13.3k*32*4B = 1.7 MB + gathered block of the same
size + idx/w blocks — comfortably under the ~16 MB VMEM limit.

STATUS (v5e, jax 0.9, 2026-08): interpret-mode parity + grad tests pass
(tests/test_pallas.py), but the kernel does NOT compile on the current
TPU toolchain — Mosaic's ``tpu.dynamic_gather`` is tile-local (8 sublanes
/ 128 lanes) and the AOT compiler crashes on table-sized gathers. The
dispatcher (ops/ms_deform_attn.py) therefore routes 'auto' to the XLA
gather path, which measures 0.157 ms for the full flagship encoder-layer
MSDA — see the probe data in that module's docstring.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _corner_indices_weights(spatial_shapes, sampling_locations,
                            attention_weights):
    """XLA prologue: flat value-row indices + folded weights per corner.

    Returns idx (B, Q, H, K) int32 and wts (B, Q, H, K) f32 with
    K = num_levels * num_points * 4; invalid (out-of-border) corners get
    weight 0 and a clamped index.
    """
    B, Q, H, L, P, _ = sampling_locations.shape
    Hs = jnp.asarray([h for h, w in spatial_shapes], jnp.float32)
    Ws = jnp.asarray([w for h, w in spatial_shapes], jnp.float32)
    starts = []
    s = 0
    for (h, w) in spatial_shapes:
        starts.append(s)
        s += h * w
    starts = jnp.asarray(starts, jnp.int32)

    x = sampling_locations[..., 0] * Ws[None, None, None, :, None] - 0.5
    y = sampling_locations[..., 1] * Hs[None, None, None, :, None] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    Wi = Ws.astype(jnp.int32)[None, None, None, :, None]
    Hi = Hs.astype(jnp.int32)[None, None, None, :, None]

    aw = attention_weights.astype(jnp.float32)
    idxs, wts = [], []
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0i + dx
            yi = y0i + dy
            wc = (fx if dx else (1.0 - fx)) * (fy if dy else (1.0 - fy))
            valid = (xi >= 0) & (xi < Wi) & (yi >= 0) & (yi < Hi)
            idx = jnp.clip(yi, 0, Hi - 1) * Wi + jnp.clip(xi, 0, Wi - 1)
            idx = idx + starts[None, None, None, :, None]
            idxs.append(idx.reshape(B, Q, H, L * P))
            wts.append((wc * valid.astype(jnp.float32) * aw
                        ).reshape(B, Q, H, L * P))
    idx = jnp.concatenate(idxs, axis=-1)
    w = jnp.concatenate(wts, axis=-1)
    return idx, w


def _kernel(v_ref, idx_ref, w_ref, o_ref):
    v = v_ref[0, 0]                             # (Nv, D)
    idx = idx_ref[0, 0]                         # (TQ, K)
    wts = w_ref[0, 0]                           # (TQ, K)
    TQ, K = idx.shape
    D = v.shape[-1]
    # Mosaic lowers take_along_axis to the hardware dynamic-gather along
    # sublanes (tpu.dynamic_gather), which requires input, indices and
    # output to share one 2D shape — the caller sizes TQ so TQ*K == Nvp.
    idx2 = jnp.broadcast_to(idx.reshape(TQ * K, 1), (TQ * K, D))
    g = jnp.take_along_axis(v, idx2, axis=0)
    g = g.reshape(TQ, K, D).astype(jnp.float32)
    o_ref[0, 0] = jnp.sum(g * wts[..., None], axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1,))
def _pallas_forward(value, spatial_shapes, sampling_locations,
                    attention_weights):
    B, Nv, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    K = L * P * 4
    idx, wts = _corner_indices_weights(spatial_shapes, sampling_locations,
                                       attention_weights)

    # tpu.dynamic_gather needs gather-output shape == value-table shape,
    # so pick the query block TQ with TQ*K == Nvp (and TQ a sublane
    # multiple): pad the value table up to a multiple of 8*K rows.
    Nvp = _round_up(Nv, 8 * K)
    TQ = Nvp // K
    Qp = _round_up(Q, TQ)
    # head-major layout so block tails are (Nv, D) / (TQ, K) — TPU tiling
    # wants the last two block dims to be (8k, 128k) or whole-array.
    vh = jnp.transpose(value, (0, 2, 1, 3))        # (B, H, Nv, D)
    idx = jnp.transpose(idx, (0, 2, 1, 3))         # (B, H, Q, K)
    wts = jnp.transpose(wts, (0, 2, 1, 3))
    if Qp != Q:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
    if Nvp != Nv:
        vh = jnp.pad(vh, ((0, 0), (0, 0), (0, Nvp - Nv), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(B, H, Qp // TQ),
        in_specs=[
            pl.BlockSpec((1, 1, Nvp, D), lambda b, h, q: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TQ, K), lambda b, h, q: (b, h, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TQ, K), lambda b, h, q: (b, h, q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TQ, D), lambda b, h, q: (b, h, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), value.dtype),
        interpret=_INTERPRET[0],
    )(vh, idx, wts)
    return jnp.transpose(out[:, :, :Q], (0, 2, 1, 3)).reshape(B, Q, H * D)


# toggled by tests to run the kernel in interpreter mode on CPU
_INTERPRET = [False]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights):
    """Fused Pallas forward; backward = VJP of the XLA formulation."""
    return _pallas_forward(value, spatial_shapes, sampling_locations,
                           attention_weights)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _pallas_forward(value, spatial_shapes, sampling_locations,
                          attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, residuals, g):
    from rscotr_tpu.ops.ms_deform_attn import _ms_deform_attn_xla

    value, sampling_locations, attention_weights = residuals
    _, vjp = jax.vjp(
        lambda v, loc, w: _ms_deform_attn_xla(v, spatial_shapes, loc, w),
        value, sampling_locations, attention_weights)
    return vjp(g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
