#!/usr/bin/env python
"""H2D payload-size scaling through the tunnel (VERDICT r4 #2 probe leg).

Times warm ``jax.device_put`` of det-devaug-sized uint8 batches at the
full 800-row source vs the static crop-window row-buckets the
crop-window-only H2D proposal would ship, with a device value-read sync
(``block_until_ready`` does not sync through the axon tunnel —
CLAUDE.md). Each shape is warmed first (the first transfer of a shape
pays ~2 s of transfer-program setup, measured round 4).

Converts the measured payload-fraction distribution of the DINO
AutoAugment pipeline (PERF.md round-5: mean 0.962 with row-buckets
{208, 416, 624, 800}) into an expected det-dispatch H2D saving.

Usage: python tools/probe_h2d_window.py [--reps 8] [--batch 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from rscotr_tpu.utils import get_root_logger  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rows", type=int, nargs="+",
                    default=[800, 624, 416, 208])
    args = ap.parse_args(argv)
    logger = get_root_logger()

    import numpy as np
    import jax

    dev = jax.devices()[0]
    logger.info("device: %s", dev)

    results = {}
    for rows in args.rows:
        x = np.random.default_rng(0).integers(
            0, 255, (args.batch, rows, 800, 3)).astype(np.uint8)
        # warm: first transfer of a shape pays program setup
        y = jax.device_put(x, dev)
        _ = np.asarray(y.ravel()[0])
        del y
        t0 = time.perf_counter()
        for _ in range(args.reps):
            y = jax.device_put(x, dev)
            _ = np.asarray(y.ravel()[0])   # force the transfer to finish
            del y
        dt = (time.perf_counter() - t0) / args.reps
        mb = x.nbytes / 1e6
        results[rows] = (dt, mb / dt)
        logger.info("rows=%4d: %6.1f MB in %6.3f s warm -> %5.1f MB/s",
                    rows, mb, dt, mb / dt)

    full_dt = results[args.rows[0]][0]
    for rows in args.rows[1:]:
        dt = results[rows][0]
        logger.info("rows=%4d saves %+.3f s/dispatch vs full "
                    "(payload x%.2f)", rows, full_dt - dt,
                    rows / args.rows[0])
    report = {r: {"s_per_dispatch": round(v[0], 4),
                  "MB_per_s": round(v[1], 1)} for r, v in results.items()}
    print(report)
    return report


if __name__ == "__main__":
    main()
    os._exit(0)   # interpreter exit can hang in axon teardown (CLAUDE.md)
