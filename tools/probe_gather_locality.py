#!/usr/bin/env python
"""Probe: does the XLA:TPU gather engine reward coherent (sorted) lookups?

VERDICT round-1 stretch item #9. The MSDA forward is lookup-count bound
(~7 ns/row regardless of width — CLAUDE.md / PERF.md cost model). A
locality-sorted gather formulation (sort sampling indices by target row
within a layer, undo the permutation after) only *can* win if sorted
index streams gather measurably faster than random ones; the in-graph
version would additionally pay an argsort + an inverse-permutation gather
(one extra lookup per row). This standalone probe isolates the prerequisite
question on the real chip:

    time gather(table, idx) for idx in {random, sorted, contiguous}

at MSDA-realistic table/lookup sizes. If sorted ~= random, the in-graph
idea is dead before engineering starts (and the 'MSDA local optimum' claim
gains another measured leg). All timing follows the CLAUDE.md rules:
work chained inside ONE jit (amortizes the ~33 ms axon dispatch), ending
in a device->host VALUE READ.

Usage: python tools/probe_gather_locality.py [--rows 16000] [--lookups 262144]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from rscotr_tpu.utils import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16000,
                    help="table rows (flagship MSDA level-0: ~10k)")
    ap.add_argument("--lanes", type=int, default=32)
    ap.add_argument("--lookups", type=int, default=262144,
                    help="lookups per gather (flagship: ~186k/level)")
    ap.add_argument("--chain", type=int, default=50,
                    help="gathers chained inside one jit")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal(
        (args.rows, args.lanes)).astype(np.float32))

    idx_random = rng.integers(0, args.rows, args.lookups).astype(np.int32)
    idx_sorted = np.sort(idx_random)
    idx_contig = (np.arange(args.lookups) % args.rows).astype(np.int32)
    # locality-window: sorted within 128-lookup blocks (what an in-graph
    # per-query sort could realistically achieve)
    idx_block = idx_random.reshape(-1, 128).copy()
    idx_block.sort(axis=1)
    idx_block = idx_block.reshape(-1)

    def chained(table, idx):
        def body(carry, _):
            g = jnp.take(table, idx + (carry[0, 0] > 1e30).astype(
                jnp.int32), axis=0)   # data-dep on carry: no CSE
            return g[:1], None
        out, _ = jax.lax.scan(body, table[:1], None, length=args.chain)
        return out

    fn = jax.jit(chained)

    results = {}
    for name, idx in (("random", idx_random), ("sorted", idx_sorted),
                      ("block128_sorted", idx_block),
                      ("contiguous", idx_contig)):
        di = jnp.asarray(idx)
        _ = np.asarray(fn(table, di).ravel()[0])      # compile + warm
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            v = np.asarray(fn(table, di).ravel()[0])  # value-read sync
            times.append(time.perf_counter() - t0)
        per_gather_us = min(times) / args.chain * 1e6
        ns_per_lookup = per_gather_us * 1000 / args.lookups
        results[name] = {"per_gather_us": round(per_gather_us, 2),
                         "ns_per_lookup": round(ns_per_lookup, 3)}
        print(f"{name:>16}: {per_gather_us:9.2f} us/gather "
              f"({ns_per_lookup:.3f} ns/lookup)", flush=True)

    print(json.dumps(results))
    os._exit(0)


if __name__ == "__main__":
    main()
