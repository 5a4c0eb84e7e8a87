#!/usr/bin/env python
"""Probe (VERDICT r2 #8): weight-folded one-hot MXU gather for the MSDA
FORWARD.

The production forward is quad-table XLA gather + `_corner_weighted_sum`
(rscotr_tpu/ops/ms_deform_attn.py). PERF.md's 2026-08-19 arithmetic rules
out a one-hot-MXU *gather* at large levels (FLOPs break even with the
~7 ns/lookup gather only at peak MXU, before one-hot build cost), but the
earlier empirical one-hot probe won marginally at the smallest level
(169 rows, 4.8 vs 5.8 ms) WITHOUT weight folding. This probe tests the
one remaining untried twist: scale the one-hot entries by the per-lookup
weight so the MXU applies the slot weights during the gather —
eliminating the separate `g * wt128` VPU pass and halving the number of
streams over the gathered tensor.

    onehot[k, r] = (idx[k] == r) * w[k]          # built in VMEM
    out[g, kblk, :] += onehot @ table[g, nvblk, :]  (f32 accumulate)

Per-level standalone comparison on det-encoder flagship shapes
(Q=13.3k, H=8, P=4, D=32, quad rows 4D=128 lanes) vs the production
slice: quad gather (promise_in_bounds take) + weighted KP-partial.
Numbers go to PERF.md; the expected outcome per the cost model is a loss
at every level except possibly 169 rows (compare-bound: one VPU compare
per one-hot entry feeds only ~2 MACs at lookup-row granularity... the
matmul here is (K x nv) @ (nv x 128) per block, same compare count as
the scatter-mm backward, whose win came solely from XLA scatter being
3-4x slower than XLA gather).

    python tools/probe_msda_weighted_gather_mm.py          # on TPU
    JAX_PLATFORMS=cpu python ... --interpret --check-only  # parity only
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from rscotr_tpu.utils import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _wg_kernel(idx_ref, w_ref, t_ref, o_ref, *, k_block, acc_dtype):
    """out[0, k, :] += ((rows == idx[k]) * w[k]) @ table[0, nv, :]."""
    n = pl.program_id(2)

    @pl.when(n == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    idx = idx_ref[...]                       # (k_block,)
    w = w_ref[...]                           # (k_block,) f32 — mosaic can't
    nv_block = t_ref.shape[1]                # minor-dim-reshape 16-bit vecs
    lo = n * nv_block
    hit = jnp.any((idx >= lo) & (idx < lo + nv_block))

    @pl.when(hit)
    def _accum():
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (k_block, nv_block), 1) + lo
        onehot = jnp.where(cols == idx[:, None], w[:, None],
                           jnp.zeros((), jnp.float32)).astype(acc_dtype)
        o_ref[0] += jnp.dot(onehot, t_ref[0].astype(acc_dtype),
                            preferred_element_type=jnp.float32)


def weighted_gather_mm(table, idx, w, k_block=1024, nv_block=1024,
                       acc_dtype=jnp.bfloat16, interpret=False):
    """out[g, k, :] = w[g, k] * table[g, idx[g, k], :] via MXU one-hot.

    table: (G, Nv, C); idx: (G, K) int32; w: (G, K). Returns (G, K, C) f32.
    """
    G, Nv, C = table.shape
    _, K = idx.shape
    # mosaic tiles rank-1 VMEM operands at 1024 — block sizes must divide
    # evenly (a kb=768 block of a 3072 operand is rejected)
    kb = min(_round_up(k_block, 1024), _round_up(K, 1024))
    nb = min(nv_block, _round_up(Nv, 8))
    Kp = _round_up(K, kb)
    Np = _round_up(Nv, nb)
    if Kp != K:
        # padded lookups: idx 0 with weight 0 -> zero rows
        idx = jnp.pad(idx, ((0, 0), (0, Kp - K)))
        w = jnp.pad(w, ((0, 0), (0, Kp - K)))
    if Np != Nv:
        table = jnp.pad(table, ((0, 0), (0, Np - Nv), (0, 0)))
    kblocks = Kp // kb
    out = pl.pallas_call(
        functools.partial(_wg_kernel, k_block=kb, acc_dtype=acc_dtype),
        grid=(G, kblocks, Np // nb),
        in_specs=[
            pl.BlockSpec((kb,), lambda g, k, n: (g * kblocks + k,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb,), lambda g, k, n: (g * kblocks + k,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, C), lambda g, k, n: (g, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kb, C), lambda g, k, n: (g, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, Kp, C), jnp.float32),
        interpret=interpret,
    )(idx.astype(jnp.int32).reshape(-1),
      w.astype(jnp.float32).reshape(-1), table)
    return out[:, :K, :]


def production_level_slice(table, idx, w):
    """The production formulation restricted to one level: quad gather
    (promise_in_bounds) + fused weight multiply, f32 result."""
    G, Nv, C = table.shape
    base = (jnp.arange(G, dtype=jnp.int32) * Nv)[:, None]
    g = table.reshape(G * Nv, C).at[(idx + base).reshape(-1)].get(
        mode="promise_in_bounds").reshape(G, -1, C)
    return g.astype(jnp.float32) * w[:, :, None].astype(jnp.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--chain", type=int, default=8,
                    help="layers chained inside one jit (amortize the "
                         "~33 ms tunnel dispatch)")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    rng = np.random.default_rng(0)

    # ---------------- parity check (small) --------------------------------
    G, Nv, C, K = 4, 300, 128, 640
    table = jnp.asarray(rng.normal(size=(G, Nv, C)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, Nv, (G, K)), jnp.int32)
    w = jnp.asarray(rng.uniform(0, 1, (G, K)), jnp.float32)
    got = np.asarray(weighted_gather_mm(table, idx, w,
                                        interpret=args.interpret))
    ref = np.asarray(production_level_slice(table, idx, w))
    err = np.abs(got - ref).max()
    print(f"parity max abs err (bf16 inputs): {err:.5f}")
    assert err < 0.05, err
    if args.check_only:
        print("parity OK")
        os._exit(0)

    # ---------------- per-level timing at det-encoder shapes --------------
    # flagship det encoder: B=1, H=8 -> G=8; Q=13.3k queries x P=4 points
    # per level; quad rows are 4*D = 128 lanes.
    Gf, Q, P, Cq = 8, 13344, 4, 128
    Kf = Q * P
    levels = [(100, 100), (50, 50), (25, 25), (13, 13)]
    results = {}
    for (h, wd) in levels:
        nv = h * wd
        table = jnp.asarray(rng.normal(size=(Gf, nv, Cq)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, nv, (Gf, Kf)), jnp.int32)
        wt = jnp.asarray(rng.uniform(0, 1, (Gf, Kf)), jnp.bfloat16)

        def chain(fn, table, idx, wt, n=args.chain):
            def body(carry, _):
                t, acc = carry
                o = fn(t, idx, wt)
                # consume the full output; feed a different table next
                # iteration (defeat dispatch caching)
                s = o.sum(dtype=jnp.float32)
                t = (t + (s * 1e-9).astype(t.dtype))
                return (t, acc + s), ()
            (t, acc), _ = jax.lax.scan(body, (table, jnp.float32(0)),
                                       None, length=n)
            return acc

        timed = {}
        for name, fn in (("weighted_mm", weighted_gather_mm),
                         ("prod_gather", production_level_slice)):
            run = jax.jit(functools.partial(chain, fn))
            acc = run(table, idx, wt)
            float(np.asarray(acc))          # compile + sync (value read)
            t0 = time.perf_counter()
            for i in range(args.iters):
                acc = run(table + i * 1e-6, idx, wt)
            val = float(np.asarray(acc))
            dt = (time.perf_counter() - t0) / (args.iters * args.chain)
            timed[name] = dt * 1e3
            print(f"nv={nv:6d} {name:12s} {dt*1e3:7.3f} ms/layer-level "
                  f"(acc={val:.1f})")
        results[nv] = timed
    print(json.dumps(results))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)
    os._exit(0)


if __name__ == "__main__":
    main()
