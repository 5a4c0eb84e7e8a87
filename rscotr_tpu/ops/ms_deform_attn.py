"""Multi-scale deformable attention sampling core (JAX/XLA + Pallas).

This replaces the mmcv CUDA op ``MultiScaleDeformableAttention``'s
``ms_deform_attn_forward/backward`` (the reference's hottest kernel — used by
the shared encoder, the DINO decoder cross-attention, and the standalone
pixel decoders; see /root/reference/configs/multi/MTL_slvlcls_...py:40,87-90).

Sampling semantics match ``F.grid_sample(align_corners=False,
padding_mode='zeros')`` on per-level (H, W) value maps with sampling
locations normalized to [0, 1]:  ``x_pix = loc_x * W - 0.5`` and bilinear
corners outside the map contribute zero.

Design notes (TPU-first):
* ``spatial_shapes`` is a STATIC tuple of (H, W) — per-level slicing is
  static, shapes fixed, XLA-friendly.
* The XLA path is pure gathers + elementwise math; autodiff gives the
  backward scatter-add for free — but XLA:TPU's scatter-add serializes at
  ~20 ns/update (~3x the gather floor) and accumulates in the table dtype,
  so the value cotangent instead goes through a custom VJP that scatters
  each level as one-hot MXU matmuls with f32 accumulation
  (ops/pallas/scatter_mm.py). Measured (v5e, det encoder, 6 layers,
  10.2 M updates, bf16): value-grad 296 -> 175 ms, full grad 431 -> 306 ms;
  kernel vs XLA scatter standalone 69 vs 103 ms.
* A fused Pallas kernel lives in rscotr_tpu/ops/pallas/ but ``impl='auto'``
  deliberately picks the XLA path on TPU. Measured evidence (v5e, jax 0.9,
  2026-08): (a) Mosaic's ``tpu.dynamic_gather`` is TILE-LOCAL — sublane
  gathers only work within one 8-row tile and lane gathers within one
  128-lane tile (probed: (8,128) axis-0 OK, (512,128) axis-0 compiler
  crash, (512,128) axis-1 OK, (256,256) axis-1 crash) — so an arbitrary
  13k-row value-table gather cannot be expressed in a Pallas kernel on
  this toolchain; (b) XLA's gather engine is LOOKUP-COUNT bound at
  ~7 ns/looked-up row — independent of row width (32 vs 128 lanes) and
  dtype (f32 == bf16) — so the quad-table formulation below (ONE lookup
  per sampling point, the structural minimum) is the fastest expressible
  form: 1.7 M lookups -> ~12 ms for the flagship det-encoder layer
  (Nv=Q=13.3k, 8 heads, 4 levels, 4 points), 2.5x the four-corner
  formulation. Unlike GPUs (mmcv's CUDA ``ms_deform_attn`` exists because
  scattered loads are native there), the TPU's scattered-load path IS the
  XLA gather op.
  The Pallas kernel stays as the drop-in for future toolchains that grow
  a real gather primitive (use ``impl='pallas'`` to opt in), and is kept
  parity-tested in interpret mode; (c) gather-as-one-hot-matmul (probed
  2026-08: XLA one-hot loses at every level size — 8.3-15.3 ms vs
  5.6-6.7 ms take for 425k lookups; a Pallas kernel building the one-hot
  in VMEM and contracting on the MXU wins only at the smallest level,
  169 rows: 4.8 vs 5.8 ms, and loses at 625+ rows) — not worth the
  precision/complexity cost, so the quad-gather stays the only path.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def ms_deform_attn(value: jnp.ndarray,
                   spatial_shapes: Tuple[Tuple[int, int], ...],
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray,
                   impl: str = "auto",
                   bwd_impl: str = "auto") -> jnp.ndarray:
    """Multi-scale deformable attention aggregation.

    Args:
        value: (B, num_value, num_heads, head_dim); num_value = sum(H*W).
        spatial_shapes: static ((H, W), ...) per level.
        sampling_locations: (B, num_query, num_heads, num_levels, num_points,
            2) in [0, 1] per level ((x, y) order).
        attention_weights: (B, num_query, num_heads, num_levels, num_points),
            already softmax-normalized over (levels * points).
    Returns:
        (B, num_query, num_heads * head_dim)
    """
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if impl == "auto":
        impl = "pallas" if _pallas_supported(value) else "xla"
    if impl == "pallas":
        from rscotr_tpu.ops.pallas.ms_deform_attn_kernel import \
            ms_deform_attn_pallas
        return ms_deform_attn_pallas(value, spatial_shapes,
                                     sampling_locations, attention_weights)
    return _ms_deform_attn_xla(value, spatial_shapes, sampling_locations,
                               attention_weights, bwd_impl)


def _pallas_supported(value: jnp.ndarray) -> bool:
    # 'auto' never picks pallas today: Mosaic's dynamic_gather is
    # tile-local (see module docstring) and the XLA gather path is faster
    # than HBM streaming at flagship shapes. Flip when the toolchain
    # grows an arbitrary-table gather.
    return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _quad_gather(qt, gidx, dims, bwd_impl):
    """Row gather from the quad table with a custom backward.

    ``qt``: (B*H*Nv, 4D); ``gidx``: (B, H, Q, L, P) global row ids. The
    forward is a plain XLA gather (the measured per-lookup optimum). The
    backward — the mmcv CUDA ``ms_deform_attn_backward``'s atomic scatter —
    is where XLA's scatter-add serializes at ~20 ns/update and accumulates
    in the table dtype; ``bwd_impl='pallas_mm'`` instead scatters each
    level's updates as one-hot MXU matmuls with f32 accumulation
    (ops/pallas/scatter_mm.py), exploiting that the level axis of ``gidx``
    is static so every update's target range is known at trace time.

    NOTE(probed 2026-08-17): fusing this gather with the corner weighted
    sum into ONE custom_vjp — so the backward never materializes
    d_g = wt (x) d_out in HBM and instead builds each level's scatter
    updates directly from the small (wt, d_out) tensors via lane
    broadcasts (jnp.repeat/jnp.tile, Q padded so the scatter k-blocks
    divide) — LOST in the real train graphs despite equal-looking HBM
    traffic on paper: det train 183.4 -> 195.9 ms, seg 158.3 -> 171.4
    (tools/benchmark.py, same day, warm). XLA already overlaps the d_g
    elementwise write with the d_wt read of the saved gathered tensor,
    and the per-level repeat/tile constructions defeated that overlap.
    Keep the two-unit split (this gather + _corner_weighted_sum below);
    grad parity vs torch autograd is pinned by
    tests/test_ops.py::test_grad_vs_torch_autograd either way.

    NOTE(probed 2026-08-17/18, both rejected): the op-level trace shows
    6 x 1.4 ms/layer relayout copies of the gathered tensor
    ({4,3,2,1,0} -> Q-minormost) feeding the KP-reduce. Two attempts to
    remove them LOST end-to-end (tools/benchmark.py, same-day warm
    baselines det train 183.4 / infer 57.4 ms):
    (a) QUERY-MAJOR order — (B, Q, H, ...) throughout so the final
        (B, Q, H*D) reshape is free and no output transpose exists; the
        backward transposed only the small wt/d_out/idx tensors and
        emitted scatter updates directly in (B*H)-group order. XLA still
        chose a Q-minormost layout for the reduce operand (the copy
        stayed), and the index/coordinate math materialized ~0.7 ms
        physical reshapes per component ((Q,H,L,P) T(4,128) tiles ->
        flat T(1,128)) that the head-major transpose had fused away:
        det infer 57.4 -> 70.9, train 183.4 -> 208.7 ms.
    (b) Query-major + the KP-reduce unrolled into a static slice-add
        tree (hoping a pure elementwise fusion would drop the reduce's
        layout preference): det infer 89.8, train 232.4 ms — far worse.
    The reduce's Q-minor operand preference is an XLA:TPU lowering
    choice this formulation cannot sidestep; the head-major form pays
    one 1.4 ms/layer copy and everything else stays fused.

    NOTE(probed 2026-08-20, rejected): weight-folded one-hot MXU gather
    — the scatter-mm kernel's inverse, ``onehot[k,r] = (idx[k]==r)*w[k]``
    so the MXU applies the slot weight during the gather and the
    separate ``g * wt`` VPU pass disappears
    (tools/probe_msda_weighted_gather_mm.py). Standalone per-level vs
    this gather + weighted partial at det-encoder flagship shapes
    (v5e, bf16, ms/layer-level): nv=10000: 10.57 vs 1.21; 2500: 5.00 vs
    1.24; 625: 3.30 vs 1.44; 169: 2.86 vs 1.04 — loses 2.7-8.7x at
    EVERY level, including the 169-row one where the unweighted one-hot
    probe had once won marginally. Confirms PERF.md's arithmetic: the
    backward's one-hot-mm win exists only because XLA scatter-add is
    3-4x slower than gather; on the forward the ~7 ns/lookup gather is
    already the optimum.
    """
    del dims, bwd_impl
    # indices are in-bounds by construction (corner starts are clamped to
    # the map and offset by static level starts), so skip jnp.take's
    # default OOB fill: mode='fill' appended a select_n pass re-streaming
    # the full gathered tensor (1.37 ms/layer at det-encoder shapes,
    # hlo_stats trace 2026-08-17).
    return qt.at[gidx.reshape(-1)].get(mode="promise_in_bounds")


def _quad_gather_fwd(qt, gidx, dims, bwd_impl):
    return _quad_gather(qt, gidx, dims, bwd_impl), gidx


def _quad_gather_bwd(dims, bwd_impl, gidx, d_g):
    B, Hn, num_value, spatial_shapes, qt_dtype = dims
    L = len(spatial_shapes)
    _, _, Q, _, P = gidx.shape
    C = d_g.shape[-1]
    d_g = d_g.reshape(B, Hn, Q, L, P, C)

    if bwd_impl == "auto":
        # pallas_mm on the TPU bf16 path. scatter_add_mm carries a
        # custom_partitioning rule that shards along the group axis
        # (G = B*heads, batch-major), so it composes with multi-device
        # data-parallel jit without replication.
        use_pallas = (jax.default_backend() == "tpu"
                      and qt_dtype == jnp.bfloat16)
        bwd_impl = "pallas_mm" if use_pallas else "xla"

    import numpy as np
    d_gidx = np.zeros(gidx.shape, dtype=jax.dtypes.float0)

    if bwd_impl == "xla":
        d_qt = jnp.zeros((B * Hn * num_value, C), jnp.float32)
        d_qt = d_qt.at[gidx.reshape(-1)].add(
            d_g.reshape(-1, C).astype(jnp.float32))
        return d_qt.astype(qt_dtype), d_gidx

    from rscotr_tpu.ops.pallas.scatter_mm import scatter_add_mm

    # NOTE(probed 2026-08): a hybrid that routed the LARGEST level
    # (10000 rows) to XLA's scatter-add — suggested by a standalone
    # microbenchmark (mm 25.7 vs xla 6.9 ms/layer at det bwd shapes) —
    # made the REAL train step slower (det 438 -> 476 ms, seg 229 ->
    # 245 ms). The standalone xla number was flattered by consuming only
    # one output element; in-graph, the scatter also forces a f32 copy of
    # the bf16 updates and extra layout moves. The one-hot MXU kernel
    # stays the only backward path on every level.
    interpret = bwd_impl == "pallas_mm_interpret"
    acc_dtype = jnp.bfloat16 if qt_dtype == jnp.bfloat16 else jnp.float32
    # the kernel casts updates to acc_dtype in VMEM anyway; casting BEFORE
    # the pallas_call halves the HBM->VMEM DMA (each update block is
    # re-fetched once per output row-block) with identical numerics
    d_g = d_g.astype(acc_dtype)
    base = (jnp.arange(B * Hn, dtype=jnp.int32) *
            num_value).reshape(B, Hn)[:, :, None, None]
    start = 0
    outs = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        nv_l = h * w
        idx_l = gidx[:, :, :, lvl] - base - start          # (B, Hn, Q, P)
        upd_l = d_g[:, :, :, lvl]                          # (B, Hn, Q, P, C)
        out_l = scatter_add_mm(
            upd_l.reshape(B * Hn, Q * P, C),
            idx_l.reshape(B * Hn, Q * P),
            nv_l, acc_dtype=acc_dtype, interpret=interpret)
        outs.append(out_l)
        start += nv_l
    d_qt = jnp.concatenate(outs, axis=1).reshape(B * Hn * num_value, C)
    return d_qt.astype(qt_dtype), d_gidx


_quad_gather.defvjp(_quad_gather_fwd, _quad_gather_bwd)


@jax.custom_vjp
def _corner_weighted_sum(g, wt):
    """out[b,h,q,d] = sum_kp sum_c g[b,h,q,kp,c*D+d] * wt[b,h,q,kp,c].

    ``g``: (B, H, Q, KP, 4*D) gathered quads in their native 128-lane
    layout; ``wt``: (B, H, Q, KP, 4) per-corner-slot weights. The forward
    reads ``g`` exactly ONCE: the slot weights are repeated onto the four
    D-lane groups inside the multiply-reduce fusion (jnp.repeat lowers to
    a fusible broadcast of the small tensor), the KP axis is reduced with
    f32 accumulation into a (B, H, Q, 4D) partial, and the four lane
    groups of that SMALL tensor are summed with static slices. An earlier
    form sliced the four 32-lane corner groups out of ``g`` and reduced
    each separately — four passes over the 437 MB/layer tensor at 1/4
    lane utilization, 154 GiB/s, 3.0 ms/layer vs the ~0.7 ms single-pass
    floor (hlo_stats trace 2026-08-17). The backward is hand-written
    because the autodiff transpose materialized four (..., KP, 32)-
    minormost tensors — 32 of 128 lanes used, 4x lane-padding waste — and
    re-assembled them with a pad+add pass (105-148 GiB/s, ~6 ms/layer).
    Here d_g is constructed directly in the 128-lane layout from two
    broadcasts (lane k of slot c reads wt[..., c] and d_out[..., k mod
    D]), one streaming write."""
    B, Hn, Q, KP, C4 = g.shape
    D = C4 // 4
    wt128 = jnp.repeat(wt, D, axis=-1)                    # (B,H,Q,KP,4D)
    tmp = jnp.sum(g * wt128, axis=3, dtype=jnp.float32)   # (B,H,Q,4D)
    out = None
    for c in range(4):
        t_c = jax.lax.slice_in_dim(tmp, c * D, (c + 1) * D, axis=-1)
        out = t_c if out is None else out + t_c
    return out


def _corner_weighted_sum_fwd(g, wt):
    return _corner_weighted_sum(g, wt), (g, wt)


def _corner_weighted_sum_bwd(res, d_out):
    g, wt = res
    B, Hn, Q, KP, C4 = g.shape
    D = C4 // 4
    wt_rep = jnp.broadcast_to(wt[..., None], (B, Hn, Q, KP, 4, D))
    do_rep = jnp.broadcast_to(d_out[:, :, :, None, None, :],
                              (B, Hn, Q, KP, 4, D))
    d_g = (wt_rep * do_rep).reshape(B, Hn, Q, KP, C4).astype(g.dtype)
    # NOTE(probed 2026-08-17): a one-pass d_wt (g * lane-tiled d_out,
    # producer-fused reshape to (..., 4, D), reduce over D) won the
    # STANDALONE probe 31x (6.4 vs 200 ms at 8 chained det-encoder
    # layers, tools/probe_dwt.py) but LOST in the real train graphs
    # (det grad 172.9 -> 180.2 ms, seg step 138.0 -> 144.6): in-graph,
    # XLA fuses the 4 static slices below with the d_g pass above so g
    # streams once for both outputs, and the reshape-reduce form broke
    # that shared-read fusion. Keep the slice form; trust full-step
    # measurements over standalone probes (PERF.md hygiene note).
    parts = []
    for c in range(4):
        g_c = jax.lax.slice_in_dim(g, c * D, (c + 1) * D, axis=-1)
        parts.append(jnp.sum(
            g_c * d_out[:, :, :, None, :], axis=-1, dtype=jnp.float32))
    d_wt = jnp.stack(parts, axis=-1).astype(wt.dtype)
    return d_g, d_wt


_corner_weighted_sum.defvjp(_corner_weighted_sum_fwd,
                            _corner_weighted_sum_bwd)


@functools.partial(jax.jit, static_argnums=(1, 4))
def _ms_deform_attn_xla(value, spatial_shapes, sampling_locations,
                        attention_weights, bwd_impl="auto"):
    """Quad-gather formulation — the production TPU path.

    Measured cost model (v5e, 2026-08): XLA's gather engine is
    LOOKUP-COUNT bound at ~7 ns/row, independent of row width (32 vs 64
    lanes identical) and dtype (f32 == bf16), NOT bandwidth bound. The
    round-1 four-corner formulation paid 4 lookups per sampling point
    (6.8M lookups -> 62 ms/encoder-layer at det shapes). Here a QUAD
    table is built per level whose row (y*W+x) holds all four bilinear
    corners [v(y,x), v(y,x+1), v(y+1,x), v(y+1,x+1)] as one 4*D-wide row
    (128 lanes for D=32), so each sampling point costs ONE lookup — the
    structural minimum B*Q*H*L*P — and the per-corner weights are
    remapped onto quad slots (edge-clamped starts shift valid corners by
    one slot; out-of-map slots read padded zeros and carry zero weight).
    25 ms -> measured 2.5x over the corner formulation; table build is
    one 5x-bytes elementwise pass (negligible vs. gather latency)."""
    B, num_value, num_heads, head_dim = value.shape
    _, num_query, _, num_levels, num_points, _ = sampling_locations.shape
    assert num_levels == len(spatial_shapes)
    assert num_value == sum(h * w for h, w in spatial_shapes)
    D = head_dim
    Hn = num_heads

    compute_dtype = value.dtype
    Hs = jnp.asarray([h for h, w in spatial_shapes], jnp.float32)
    Ws = jnp.asarray([w for h, w in spatial_shapes], jnp.float32)
    starts = []
    s = 0
    for (h, w) in spatial_shapes:
        starts.append(s)
        s += h * w
    starts = jnp.asarray(starts, jnp.int32)

    # ---- quad table: row (y*W+x) = the 2x2 corner neighborhood ---------
    vh = jnp.transpose(value, (0, 2, 1, 3))     # (B, H, Nv, D)
    quads = []
    off = 0
    for (h, w) in spatial_shapes:
        vl = vh[:, :, off:off + h * w].reshape(B, Hn, h, w, D)
        vp = jnp.pad(vl, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        quad = jnp.concatenate(
            [vp[:, :, :h, :w], vp[:, :, :h, 1:w + 1],
             vp[:, :, 1:h + 1, :w], vp[:, :, 1:h + 1, 1:w + 1]], -1)
        quads.append(quad.reshape(B, Hn, h * w, 4 * D))
        off += h * w
    qt = jnp.concatenate(quads, axis=2).reshape(B * Hn * num_value, 4 * D)

    # ---- pixel coords per grid_sample(align_corners=False) -------------
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
    xl = jnp.clip(x0i, 0, Wi - 1)
    yl = jnp.clip(y0i, 0, Hi - 1)
    idx = yl * Wi + xl + starts[None, None, None, :, None]  # (B,Q,H,L,P)

    # ---- corner weights remapped to quad slots --------------------------
    # clamping can shift the start by one cell (e.g. x0=-1 -> xl=0), so
    # corner (dy,dx) lands on slot (dy + y0-yl, dx + x0-xl). A corner whose
    # slot falls outside {0,1}x{0,1} is off-map and its validity factor is
    # already zero (clip only shifts when the start is off-map on that
    # axis), so routing through a 4-wide one_hot (out-of-range -> zero row)
    # is exact. One-hot einsum instead of a 4-way python stack: the stack's
    # autodiff transpose was a degenerate-layout split measured at 10.5
    # ms/layer on v5e (trace 2026-08-17).
    aw = attention_weights.astype(jnp.float32)
    sy = y0i - yl
    sx = x0i - xl
    vy0 = ((y0i >= 0) & (y0i < Hi)).astype(jnp.float32)
    vy1 = ((y0i + 1 >= 0) & (y0i + 1 < Hi)).astype(jnp.float32)
    vx0 = ((x0i >= 0) & (x0i < Wi)).astype(jnp.float32)
    vx1 = ((x0i + 1 >= 0) & (x0i + 1 < Wi)).astype(jnp.float32)
    wy = jnp.stack([(1.0 - fy) * vy0, fy * vy1], -1)      # (B,Q,H,L,P,2)
    wx = jnp.stack([(1.0 - fx) * vx0, fx * vx1], -1)
    # corner axis m = 2*dy + dx
    wxy = (wy[..., :, None] * wx[..., None, :]).reshape(
        aw.shape + (4,)) * aw[..., None]                  # (B,Q,H,L,P,4)
    dy_m = jnp.asarray([0, 0, 1, 1], jnp.int32)
    dx_m = jnp.asarray([0, 1, 0, 1], jnp.int32)
    slot = (2 * (sy[..., None] + dy_m) +
            (sx[..., None] + dx_m))                       # (B,Q,H,L,P,4)
    onehot = jax.nn.one_hot(slot, 4, dtype=jnp.float32)   # (...,4m,4s)
    wslot = jnp.einsum("...ms,...m->...s", onehot, wxy)   # (B,Q,H,L,P,4)

    # ---- ONE gather per sampling point ----------------------------------
    base = (jnp.arange(B * Hn) * num_value).reshape(B, Hn)
    gidx = jnp.transpose(idx, (0, 2, 1, 3, 4)) + \
        base[:, :, None, None, None]
    KP = num_levels * num_points
    g = _quad_gather(qt, gidx,
                     (B, Hn, num_value, spatial_shapes, qt.dtype), bwd_impl)
    # keep g in its native (rows, 4D=128-lane) layout: reshaping it to
    # (..., 4, D) forces a T(8,128)->T(4,128) relayout of the whole 437
    # MB/layer tensor in BOTH fwd and bwd (measured 6.9 ms/layer each way,
    # trace 2026-08-17). Instead slice the 4 corner-slot lane groups
    # statically and multiply-reduce each in place, f32 accumulation.
    g = g.reshape(B, Hn, num_query, KP, 4 * D)
    wt = jnp.transpose(wslot.reshape(B, num_query, Hn, KP, 4),
                       (0, 2, 1, 3, 4))                   # (B,H,Q,KP,4)
    wt = wt.astype(compute_dtype)
    gc = g if compute_dtype == g.dtype else g.astype(compute_dtype)
    out = _corner_weighted_sum(gc, wt)                    # (B,H,Q,D) f32
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(
        B, num_query, num_heads * head_dim).astype(compute_dtype)


def ms_deform_attn_reference_numpy(value, spatial_shapes, sampling_locations,
                                   attention_weights):
    """Slow numpy oracle for tests (direct transliteration of the math)."""
    import numpy as np

    B, _, num_heads, head_dim = value.shape
    _, num_query, _, num_levels, num_points, _ = sampling_locations.shape
    out = np.zeros((B, num_query, num_heads, head_dim), dtype=np.float64)
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = np.asarray(value[:, start:start + H * W], dtype=np.float64)
        v = v.reshape(B, H, W, num_heads, head_dim)
        start += H * W
        for b in range(B):
            for q in range(num_query):
                for h in range(num_heads):
                    for p in range(num_points):
                        lx, ly = np.asarray(
                            sampling_locations[b, q, h, lvl, p],
                            dtype=np.float64)
                        aw = float(attention_weights[b, q, h, lvl, p])
                        x = lx * W - 0.5
                        y = ly * H - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        fx, fy = x - x0, y - y0
                        s = np.zeros(head_dim)
                        for dy in (0, 1):
                            for dx in (0, 1):
                                xi, yi = x0 + dx, y0 + dy
                                if 0 <= xi < W and 0 <= yi < H:
                                    w = (fx if dx else 1 - fx) * \
                                        (fy if dy else 1 - fy)
                                    s += w * v[b, yi, xi, h]
                        out[b, q, h] += aw * s
    return out.reshape(B, num_query, num_heads * head_dim)
