"""Pallas TPU kernel: grouped scatter-add as a one-hot matmul on the MXU.

Computes ``out[g, r, :] = sum_{k: idx[g, k] == r} updates[g, k, :]`` — the
transpose of a grouped row gather. This is the gradient of the MSDA quad
gather w.r.t. the value table (rscotr_tpu/ops/ms_deform_attn.py): the
reference's CUDA ``ms_deform_attn_backward`` does this scatter with atomic
adds (mmcv kernel semantics); XLA:TPU lowers it to a serializing scatter-add
measured at ~20 ns/update (~3x the 7 ns/lookup gather floor, and it
accumulates in the update dtype).

The kernel instead builds one-hot blocks in VMEM with an iota-compare and
contracts them on the MXU, accumulating in f32:

    out_block[nv, C] += onehot(idx_block)[nv, k] @ updates_block[k, C]

FLOPs are 2*Nv*K*C per group, so this wins exactly where XLA's scatter is
count-bound and Nv is moderate (every MSDA level at flagship shapes:
10000/2500/625/169 rows). Measured v5e (det encoder, 6 layers, 10.2 M
updates): XLA scatter-add ~204 ms -> this kernel path ~see
ms_deform_attn.py docstring. Per-element cost model: one VPU compare per
one-hot entry (1/1024 cycle) buys 128 MXU MACs (~1/512 cycle at 4 MXUs) —
the matmul dominates, so the one-hot build is effectively free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(idx_ref, u_ref, o_ref, *, nv_block: int, acc_dtype):
    # blocks: idx (k_block,) i32 (flat per-group slice); u (1, k_block, C);
    # o (1, nv_block, C) f32
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    n = pl.program_id(1)
    idx = idx_ref[...]
    lo = n * nv_block
    # Deformable-attention scatter targets are spatially LOCAL (sampling
    # points cluster around each query's reference point), and a k-block
    # covers consecutive queries — so most (row-block, update-block) pairs
    # contain zero hits. Skip the one-hot build + MXU matmul for those
    # (exact: skipped blocks contribute nothing). Worst case (uniform
    # targets) degrades to the dense kernel plus one VPU compare pass.
    hit = jnp.any((idx >= lo) & (idx < lo + nv_block))

    @pl.when(hit)
    def _accum():
        k_block = idx.shape[0]
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (nv_block, k_block), 0) + lo
        onehot = (rows == idx[None, :]).astype(acc_dtype)   # (nv, k)
        o_ref[0] += jnp.dot(onehot, u_ref[0].astype(acc_dtype),
                            preferred_element_type=jnp.float32)


def _kernel_gated(idx_ref, u_hbm, o_ref, u_vmem, sem, *, nv_block: int,
                  k_block: int, acc_dtype):
    # Like _kernel, but the update block's HBM->VMEM DMA is ISSUED ONLY
    # ON HIT (~90% of (row-block, update-block) pairs are empty at
    # det-encoder level-0 shapes, and the auto-pipeline streams them
    # all). NOT the default: it won STANDALONE (5.05 -> 3.89 ms/call,
    # exact) but in the REAL train graphs det was flat (179.8 -> 180.3)
    # and seg REGRESSED (131.2 -> 134.3 ms, scan-mode 2026-08-18) — in
    # graph the auto-pipeline's streaming prefetch overlaps with
    # neighboring ops for free, while gating serializes copy latency
    # into the critical path. Kept as an option for sparser/larger
    # scatters where the DMA truly dominates.
    g = pl.program_id(0)
    n = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    idx = idx_ref[...]
    lo = n * nv_block
    hit = jnp.any((idx >= lo) & (idx < lo + nv_block))

    @pl.when(hit)
    def _accum():
        cp = pltpu.make_async_copy(
            u_hbm.at[g, pl.ds(k * k_block, k_block)], u_vmem, sem)
        cp.start()
        cp.wait()
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (nv_block, k_block), 0) + lo
        onehot = (rows == idx[None, :]).astype(acc_dtype)   # (nv, k)
        o_ref[0] += jnp.dot(onehot, u_vmem[...].astype(acc_dtype),
                            preferred_element_type=jnp.float32)


def scatter_add_mm(updates: jnp.ndarray, idx: jnp.ndarray, num_rows: int,
                   nv_block: int = 1024, k_block: int = 1024,
                   acc_dtype=jnp.bfloat16,
                   interpret: bool = False,
                   gate_dma: bool = False) -> jnp.ndarray:
    """Grouped scatter-add via MXU one-hot matmuls.

    SPMD-partitionable along the group axis G (``custom_partitioning``):
    under a multi-device jit with the batch (and hence G = B*heads) sharded
    over the data axis, each device runs the kernel on its local groups —
    no replication, no collectives (groups are independent). All other
    axes are forced replicated.

    Args:
        updates: (G, K, C) — C must be a multiple of 128 for peak layout.
        idx: (G, K) int32 row targets in [0, num_rows).
        num_rows: output rows per group.
        acc_dtype: one-hot/updates matmul input dtype (accumulation is
            always f32; bf16 inputs run the MXU at full rate).
    Returns:
        (G, num_rows, C) float32.
    """
    return _scatter_add_mm_sharded(updates, idx, num_rows, nv_block,
                                   k_block, acc_dtype, interpret, gate_dma)


def _scatter_add_mm_local(updates, idx, num_rows, nv_block, k_block,
                          acc_dtype, interpret, gate_dma=False):
    G, K, C = updates.shape
    assert idx.shape == (G, K)
    kb = min(k_block, _round_up(K, 128))
    nb = min(nv_block, _round_up(num_rows, 8))
    Kp = _round_up(K, kb)
    Np = _round_up(num_rows, nb)
    if Kp != K:
        updates = jnp.pad(updates, ((0, 0), (0, Kp - K), (0, 0)))
        # padded updates are zero, so their target row is irrelevant
        idx = jnp.pad(idx, ((0, 0), (0, Kp - K)))

    kblocks = Kp // kb
    # flat 1-D idx blocks: Mosaic's (8, 128) tiling rule rejects a
    # (1, kb) 2-D block of the (G, K) index array
    idx_spec = pl.BlockSpec((kb,), lambda g, n, k: (g * kblocks + k,),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, nb, C), lambda g, n, k: (g, n, 0),
                            memory_space=pltpu.VMEM)
    if gate_dma:
        out = pl.pallas_call(
            functools.partial(_kernel_gated, nv_block=nb, k_block=kb,
                              acc_dtype=acc_dtype),
            grid=(G, Np // nb, kblocks),
            in_specs=[idx_spec,
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((G, Np, C), jnp.float32),
            scratch_shapes=[pltpu.VMEM((kb, C), updates.dtype),
                            pltpu.SemaphoreType.DMA],
            interpret=interpret,
        )(idx.astype(jnp.int32).reshape(-1), updates)
    else:
        out = pl.pallas_call(
            functools.partial(_kernel, nv_block=nb, acc_dtype=acc_dtype),
            grid=(G, Np // nb, kblocks),
            in_specs=[idx_spec,
                      pl.BlockSpec((1, kb, C), lambda g, n, k: (g, k, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((G, Np, C), jnp.float32),
            interpret=interpret,
        )(idx.astype(jnp.int32).reshape(-1), updates)
    return out[:, :num_rows, :]


@functools.partial(custom_partitioning,
                   static_argnums=(2, 3, 4, 5, 6, 7))
def _scatter_add_mm_sharded(updates, idx, num_rows, nv_block, k_block,
                            acc_dtype, interpret, gate_dma):
    return _scatter_add_mm_local(updates, idx, num_rows, nv_block, k_block,
                                 acc_dtype, interpret, gate_dma)


def _g_spec(arg_shapes):
    spec = arg_shapes[0].sharding.spec
    return spec[0] if len(spec) else None


def _sharded_partition(num_rows, nv_block, k_block, acc_dtype, interpret,
                       gate_dma, mesh, arg_shapes, result_shape):
    g = _g_spec(arg_shapes)

    def lower_fn(updates, idx):
        return _scatter_add_mm_local(updates, idx, num_rows, nv_block,
                                     k_block, acc_dtype, interpret,
                                     gate_dma)

    return (mesh, lower_fn,
            NamedSharding(mesh, P(g, None, None)),
            (NamedSharding(mesh, P(g, None, None)),
             NamedSharding(mesh, P(g, None))))


def _sharded_infer(num_rows, nv_block, k_block, acc_dtype, interpret,
                   gate_dma, mesh, arg_shapes, result_shape):
    return NamedSharding(mesh, P(_g_spec(arg_shapes), None, None))


_scatter_add_mm_sharded.def_partition(
    partition=_sharded_partition,
    infer_sharding_from_operands=_sharded_infer,
    # shardy rule: G is the only partitionable axis; sharding K would need
    # a cross-shard reduction and sharding C/N would split kernel tiles
    sharding_rule="g k c, g k -> g n c",
    need_replication_factors=("k", "c", "n"),
)


def scatter_add_xla(updates: jnp.ndarray, idx: jnp.ndarray,
                    num_rows: int) -> jnp.ndarray:
    """Oracle/fallback: XLA scatter-add (f32 accumulate)."""
    G, K, C = updates.shape
    out = jnp.zeros((G, num_rows, C), jnp.float32)
    return out.at[jnp.arange(G)[:, None], idx].add(
        updates.astype(jnp.float32))
