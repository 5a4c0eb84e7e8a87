"""Pallas TPU kernels: MSDA corner-weighted sum — PROBED AND REJECTED.

STATUS (v5e, 2026-08-18): not wired into the production path. Measured
with 6 chained dispatches at det-encoder shapes (G=8, Q=13294, KP=16,
4D=128, bf16), input-perturbation chain overhead (~1.3 ms/layer)
subtracted: forward ~2.4 ms/layer vs the XLA fusion pipeline's ~2.5
(copy 1.3 + convert_reduce 1.2), backward ~7.2 ms/layer vs XLA's ~6.2
(d_g build 3.1 + d_wt 3.1). The kernel loses because Pallas streaming on
this chip plateaus at ~450-550 GB/s effective (a pure copy kernel reads
436 MB in ~1.0-1.2 ms at every q_block in {256,512,1024} and with
parallel dimension semantics), while XLA's fusions overlap the same
traffic with neighbours — the layout win (no Q-minor relayout copy) is
repaid in raw DMA inefficiency, and the in-kernel lane->sublane weight
broadcast costs another ~1 ms/layer (pre-expanding the weights to 128
lanes in XLA shifts the cost into +436 MB of kernel input DMA instead).
Kept as measured evidence + interpret-mode-tested fallback for future
toolchains with faster Pallas streaming; see PERF.md "the MSDA layout
frontier" and the negative-result notes in ops/ms_deform_attn.py.

Would replace the weighted-sum half of the mmcv CUDA ``ms_deform_attn`` op
(/root/reference — the attention-weight reduction inside
``ms_deform_attn_forward/backward``): given the quad-gather output ``g``
(one 4*D-wide row of bilinear corners per sampling point, see
rscotr_tpu/ops/ms_deform_attn.py) and per-corner-slot weights ``wt``,

    out[g, q, d]         = sum_k sum_c g[g, q, k, c*D+d] * wt[g, q, c, k]
    d_g[g, q, k, c*D+d]  = wt[g, q, c, k] * d_out[g, q, d]
    d_wt[g, q, c, k]     = sum_d g[g, q, k, c*D+d] * d_out[g, q, d]

Why a kernel when this is "just" a multiply-reduce: XLA:TPU's reduce
lowering prefers a Q-minormost operand layout, which inserts a relayout
copy of the full gathered tensor (437 MB/layer at det-encoder shapes,
1.3-1.4 ms/layer) in front of every reduce, and the reduce fusion then
re-reads two big operands — ~2.2 GB of HBM traffic per layer against a
~0.9 GB structural floor (hlo_stats traces 2026-08-17/18; three pure-XLA
reformulations all lost, see the negative-result notes in
ms_deform_attn.py). A pallas_call is a custom call with fixed row-major
operand layouts, so the layout preference cannot propagate into ``g``:
the forward streams ``g`` exactly once at HBM bandwidth, and the backward
streams ``g`` once (d_wt) while writing ``d_g`` once.

Layout rules learned the hard way (v5e, 2026-08-18):
* Operands/results of a pallas_call get forced row-major layouts, and TPU
  HBM arrays are tiled on their last two dims — so a trailing dim of 4
  (the corner axis) is lane-padded 4 -> 128, inflating a 14 MB weight
  tensor to 436 MB of real DMA. The weights therefore travel as
  (G, Q, 4*KP) with the corner axis folded C-MAJOR into lanes (KP=16
  -> 64 lanes, only 2x padding), and d_wt is emitted the same way.
* The corner dimension of ``g`` is handled with STATIC 32-lane slices
  (never a (..., 4, D) reshape — lane regrouping is exactly the relayout
  this kernel exists to avoid).
* A concatenate/stack of per-corner results allocated 24 MB of scoped
  VMEM and OOM'd; per-corner static-slice STORES into the output refs
  keep the stack flat.

Block model: grid (G, ceil(Q/q_block)); every block holds all KP sampling
points and the full 4*D row of one query stripe — (q_block, KP, 4D) bf16
= 1 MB at the default q_block=256, KP=16, D=32 — a pure streaming pass;
Mosaic double-buffers the DMAs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(g_ref, w_ref, o_ref):
    g = g_ref[0]                                   # (Qb, KP, 4D)
    w = w_ref[0].astype(jnp.float32)               # (Qb, 4*KP) c-major
    Qb, KP, C4 = g.shape
    D = C4 // 4
    out = None
    for c in range(4):
        g_c = g[:, :, c * D:(c + 1) * D].astype(jnp.float32)
        w_c = jax.lax.broadcast_in_dim(
            w[:, c * KP:(c + 1) * KP], (Qb, KP, D), (0, 1))
        t = jnp.sum(g_c * w_c, axis=1)                      # (Qb, D)
        out = t if out is None else out + t
    o_ref[0] = out


def _bwd_kernel(g_ref, w_ref, d_ref, dg_ref, dw_ref):
    g = g_ref[0]                                   # (Qb, KP, 4D)
    w = w_ref[0]                                   # (Qb, 4*KP) c-major
    do = d_ref[0]                                  # (Qb, D) f32
    Qb, KP, C4 = g.shape
    D = C4 // 4
    do_k = do[:, None, :]                          # (Qb, 1, D)
    for c in range(4):
        w_c = jax.lax.broadcast_in_dim(
            w[:, c * KP:(c + 1) * KP].astype(jnp.float32), (Qb, KP, D),
            (0, 1))
        dg_ref[0, :, :, c * D:(c + 1) * D] = (w_c * do_k).astype(
            dg_ref.dtype)
        g_c = g[:, :, c * D:(c + 1) * D].astype(jnp.float32)
        dw_ref[0, :, c * KP:(c + 1) * KP] = jnp.sum(g_c * do_k, axis=2)


def ws_fwd(g: jnp.ndarray, wt: jnp.ndarray, q_block: int = 256,
           interpret: bool = False) -> jnp.ndarray:
    """Corner-weighted sum. g: (G, Q, KP, 4D); wt: (G, Q, 4*KP) with the
    corner axis folded c-major into lanes. Returns (G, Q, D) float32."""
    G, Q, KP, C4 = g.shape
    D = C4 // 4
    qb = min(q_block, Q)
    grid = (G, pl.cdiv(Q, qb))
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qb, KP, C4), lambda b, n: (b, n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 4 * KP), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qb, D), lambda b, n: (b, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, Q, D), jnp.float32),
        interpret=interpret,
    )(g, wt)


def ws_bwd(g: jnp.ndarray, wt: jnp.ndarray, d_out: jnp.ndarray,
           q_block: int = 128, interpret: bool = False):
    """One streamed pass: d_g (G, Q, KP, 4D) in g.dtype and
    d_wt (G, Q, 4*KP) float32 (corner axis c-major in lanes).
    d_out: (G, Q, D) float32."""
    G, Q, KP, C4 = g.shape
    D = C4 // 4
    qb = min(q_block, Q)
    grid = (G, pl.cdiv(Q, qb))
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qb, KP, C4), lambda b, n: (b, n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 4 * KP), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, D), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, qb, KP, C4), lambda b, n: (b, n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 4 * KP), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Q, KP, C4), g.dtype),
            jax.ShapeDtypeStruct((G, Q, 4 * KP), jnp.float32),
        ],
        interpret=interpret,
    )(g, wt, d_out.astype(jnp.float32))
