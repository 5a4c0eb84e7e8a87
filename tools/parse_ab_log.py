#!/usr/bin/env python
"""Summarize a train run's metrics.jsonl for the host-vs-device augment A/B.

Usage: python tools/parse_ab_log.py WORK_DIR [--skip N]

Prints steady-state (after --skip records, default: drop the first 25% of
records to exclude compile iterations) mean/median of ``time`` and
``data_time`` overall and per task, plus the implied s/iter and img/s for
the flagship mix. Records come from utils/logging.py's jsonl sink (one
record per log interval). Sampling caveats (engine/hooks.py LogHook):

* In per-iter mode only ``time`` is recomputed as dt/iters over the
  interval; ``data_time`` is the LAST iteration's point sample. With
  log interval > 1 the data_time stats below are therefore sample
  statistics, not per-interval averages (scan mode averages both).
* Per-task grouping attributes a record to the task named in its loss
  keys. With an interleaving MTL strategy and log interval > 1 the
  interval spans mixed-task iterations, so per-task ``time`` stats are
  cross-contaminated — trust them only with log interval=1 or a
  task-blocked strategy.
"""
import argparse
import json
import os
import sys
from collections import defaultdict

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("work_dir")
    p.add_argument("--skip", type=int, default=None,
                   help="records to drop from the start (default 25%%)")
    args = p.parse_args()
    path = os.path.join(args.work_dir, "metrics.jsonl")
    recs = [json.loads(l) for l in open(path) if l.strip()]
    recs = [r for r in recs if "time" in r]
    if not recs:
        sys.exit("no time records in " + path)
    skip = args.skip if args.skip is not None else max(1, len(recs) // 4)
    recs = recs[skip:]

    def stats(rs):
        t = np.array([r["time"] for r in rs])
        d = np.array([r["data_time"] for r in rs])
        return dict(n=len(rs), time_mean=float(t.mean()),
                    time_median=float(np.median(t)),
                    data_time_mean=float(d.mean()),
                    data_time_median=float(np.median(d)))

    by_task = defaultdict(list)
    for r in recs:
        task = next((k.split(".")[0] for k in r
                     if "." in k and k.split(".")[0] in
                     ("cls", "det", "seg")), "?")
        by_task[task].append(r)

    overall = stats(recs)
    # flagship mix: 16 cls + 1 det + 2 seg images over THREE round-robin
    # iterations -> mix img/s = 19 / (3 * mean per-iter time)
    overall["mix_img_per_s"] = round(
        19.0 / (3.0 * overall["time_mean"]), 2)
    out = {"overall": overall,
           "per_task": {k: stats(v) for k, v in sorted(by_task.items())},
           "skipped_records": skip}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
