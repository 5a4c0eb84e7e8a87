#!/usr/bin/env python
"""Host-side cls input-prep microbenchmark: host-pixel pipeline vs
device-augment planner.

Times ONLY the host work per sample (no model, no device): the full
reference cls train tail (RandomResizedCrop/Flip/RandAugment/Erase/
Normalize on 256px float32 post-decode images, as LoadImageFromFile
emits them in production) vs the DeviceAugmentPlanner path
(parameter draws + uint8 passthrough). This isolates the prep cost that
bounds scan-mode (K-step) training throughput, where K same-task batches
must be prepped back-to-back (PERF.md host-input-bottleneck section);
the wall-clock A/B of tools/train.py covers the per-iter dispatch mode.

Usage: python tools/bench_host_prep.py [--n 256] [--size 256] [--out 224]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--out", type=int, default=224)
    args = p.parse_args()

    from rscotr_tpu.data import pipelines as P

    rand_aug_policies = None  # default 15-op pool, mirrors rand_aug.py
    host_cfgs = [
        dict(type="RandomResizedCrop", size=args.out,
             interpolation="bicubic"),
        dict(type="RandomFlip", flip_prob=0.5, direction="horizontal"),
        dict(type="RandAugment", num_policies=2, total_level=10,
             magnitude_level=9, magnitude_std=0.5,
             **({"policies": rand_aug_policies} if rand_aug_policies
                else {})),
        dict(type="RandomErasing", erase_prob=0.25, mode="rand",
             min_area_ratio=0.02, max_area_ratio=1 / 3,
             fill_color=[104, 116, 124], fill_std=[0, 0, 0]),
        dict(type="Normalize"),
    ]
    dev_cfgs, _norm, _dev = P.split_device_augment_cfg(
        host_cfgs, src_size=args.size)

    host_tail = P.build_pipeline(host_cfgs)
    dev_tail = P.build_pipeline(dev_cfgs)

    rng_img = np.random.default_rng(0)
    imgs = rng_img.uniform(0, 255, (32, args.size, args.size, 3)) \
        .astype(np.float32)

    def run(tail, seed0):
        rngs = [np.random.Generator(np.random.PCG64(seed0 + i))
                for i in range(args.n)]
        t0 = time.perf_counter()
        for i in range(args.n):
            r = {"img": imgs[i % 32].copy(), "gt_label": np.int32(0)}
            for t in tail:
                r = t(r, rngs[i])
        return (time.perf_counter() - t0) / args.n * 1e3

    # warmup then measure
    run(host_tail, 10**6)
    run(dev_tail, 10**6)
    host_ms = run(host_tail, 0)
    dev_ms = run(dev_tail, 0)
    print(json.dumps({
        "n": args.n, "src": args.size, "out": args.out,
        "host_pipeline_ms_per_img": round(host_ms, 3),
        "device_planner_ms_per_img": round(dev_ms, 3),
        "speedup": round(host_ms / dev_ms, 1),
        "host_ms_per_cls_batch16": round(host_ms * 16, 1),
        "planner_ms_per_cls_batch16": round(dev_ms * 16, 1),
    }))


if __name__ == "__main__":
    main()
