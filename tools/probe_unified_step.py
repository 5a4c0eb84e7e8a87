#!/usr/bin/env python
"""Probe: ONE compiled step for all three tasks (SURVEY §7 north star).

VERDICT r2 next #7 — measure, with numbers, whether a unified
``lax.switch``-dispatched train step (one executable, task chosen by a
runtime scalar) beats today's 3 per-task jitted steps + same-task K-scan
grouping. Three measurements on the target device:

1. compile time: unified switch step vs the 3 separate steps
2. per-task step time: unified (task_id scalar) vs the dedicated step
3. mixed-task K-scan: lax.scan whose body switches per step (the payoff
   candidate — dispatch amortization WITHOUT same-task grouping) vs K
   individual dispatches, on a round-robin task sequence

The switch step must carry ALL THREE tasks' batch arrays every call
(only one branch executes, but operands ship regardless) — the H2D and
HBM cost of that is part of the verdict. Results go to PERF.md.

    JAX_PLATFORMS=cpu python tools/probe_unified_step.py \
        configs/multi/MTL_tiny_synthetic.py --iters 10
    python tools/probe_unified_step.py \
        configs/multi/MTL_synthetic_flagship.py --iters 20   # on TPU
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from rscotr_tpu.utils import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()


def sync(x):
    """Value-read sync (CLAUDE.md: block_until_ready does not sync through
    the axon tunnel)."""
    import numpy as np
    import jax
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf).ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--k", type=int, default=9, help="mixed-scan length")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from rscotr_tpu.apis import (derive_shapes, init_model_params,
                                 make_step_config)
    from rscotr_tpu.config import Config
    from rscotr_tpu.data import load_data_cfg
    from rscotr_tpu.engine import build_optimizer, task_param_masks
    from rscotr_tpu.engine.train_step import make_train_step
    from rscotr_tpu.models import build_model

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(args.config if os.path.isabs(args.config)
                          else os.path.join(root, args.config))
    cfg = load_data_cfg(cfg, config_root=root)
    model = build_model(cfg.model)
    params = init_model_params(model, cfg, seed=0)
    step_cfg = make_step_config(cfg)
    shapes = derive_shapes(cfg)
    optimizer = build_optimizer(
        cfg.optimizer, params["params"],
        lr_config=dict(cfg.get("lr_config", {"policy": "fixed"})),
        grad_clip=(cfg.get("optimizer_config", {}) or {}).get("grad_clip"))
    opt_state = optimizer.init(params["params"])
    masks = task_param_masks(params["params"], cls_uses_encoder=False)

    rng = np.random.default_rng(0)

    def batches():
        out = {}
        bs, h, w, _ = shapes["cls"]
        out["cls"] = {
            "img": jnp.asarray(rng.normal(size=(bs, h, w, 3)),
                               jnp.float32),
            "gt_label": jnp.asarray(rng.integers(0, 45, bs), jnp.int32)}
        bs, h, w, _ = shapes["det"]
        mg = shapes["det_max_gt"]
        gt = np.zeros((bs, mg, 4), np.float32)
        gt[:, :4] = [50, 50, 150, 150]
        gv = np.zeros((bs, mg), bool)
        gv[:, :4] = True
        out["det"] = {
            "img": jnp.asarray(rng.normal(size=(bs, h, w, 3)),
                               jnp.float32),
            "img_hw": jnp.asarray([[h, w]] * bs, jnp.int32),
            "gt_bboxes": jnp.asarray(gt),
            "gt_labels": jnp.zeros((bs, mg), jnp.int32),
            "gt_valid": jnp.asarray(gv)}
        bs, h, w, _ = shapes["seg"]
        out["seg"] = {
            "img": jnp.asarray(rng.normal(size=(bs, h, w, 3)),
                               jnp.float32),
            "gt_semantic_seg": jnp.asarray(
                rng.integers(0, 5, (bs, h, w)), jnp.int32)}
        return out

    tasks = ("cls", "det", "seg")

    # ---------------- baseline: 3 dedicated steps -------------------------
    steps = {}
    t0 = time.perf_counter()
    sep_compile = {}
    b = batches()
    for t in tasks:
        steps[t] = make_train_step(model, optimizer, t, step_cfg,
                                   masks.get(t), donate=False)
        tc0 = time.perf_counter()
        p, o, lv = steps[t](params, opt_state, b[t], jax.random.key(0))
        sync(lv["loss"])
        sep_compile[t] = time.perf_counter() - tc0
    print("separate compile times:", {k: round(v, 1)
                                      for k, v in sep_compile.items()})

    sep_time = {}
    for t in tasks:
        p2, o2 = params, opt_state
        for _ in range(2):   # warm
            p2, o2, lv = steps[t](p2, o2, b[t], jax.random.key(1))
        sync(lv["loss"])
        ts = time.perf_counter()
        for i in range(args.iters):
            p2, o2, lv = steps[t](p2, o2, b[t], jax.random.key(i))
        sync(lv["loss"])
        sep_time[t] = (time.perf_counter() - ts) / args.iters
    print("separate step s/iter:", {k: round(v, 4)
                                    for k, v in sep_time.items()})

    # ---------------- unified switch step ---------------------------------
    # each branch IS the production per-task step body; only the log-vars
    # are reduced to a fixed (loss, grad_norm) pair so lax.switch sees an
    # identical output structure on every branch
    from rscotr_tpu.engine.train_step import _train_step_body
    bodies = {t: _train_step_body(model, optimizer, t, step_cfg,
                                  masks.get(t)) for t in tasks}

    def make_branch(task):
        body = bodies[task]

        def branch(op):
            p, o, bb, key = op
            newp, newo, lv = body(p, o, bb[task], key)
            return newp, newo, jnp.stack([lv["loss"], lv["grad_norm"]])

        return branch

    branches = [make_branch(t) for t in tasks]

    @jax.jit
    def unified_step(p, o, bb, task_id, key):
        return jax.lax.switch(task_id, branches, (p, o, bb, key))

    tc0 = time.perf_counter()
    p2, o2, total = unified_step(params, opt_state, b, 0,
                                 jax.random.key(0))
    sync(total)
    uni_compile = time.perf_counter() - tc0
    print("unified compile time:", round(uni_compile, 1), "s (vs separate",
          round(sum(sep_compile.values()), 1), "s)")

    uni_time = {}
    for ti, t in enumerate(tasks):
        p2, o2 = params, opt_state
        for _ in range(2):
            p2, o2, total = unified_step(p2, o2, b, ti, jax.random.key(1))
        sync(total)
        ts = time.perf_counter()
        for i in range(args.iters):
            p2, o2, total = unified_step(p2, o2, b, ti, jax.random.key(i))
        sync(total)
        uni_time[t] = (time.perf_counter() - ts) / args.iters
    print("unified step s/iter:", {k: round(v, 4)
                                   for k, v in uni_time.items()})

    # ---------------- mixed-task K-scan ------------------------------------
    K = args.k

    @jax.jit
    def mixed_scan(p, o, bb, task_ids, key):
        def body(carry, tid):
            p, o = carry
            k = jax.random.fold_in(key, tid)
            p, o, total = jax.lax.switch(tid, branches, (p, o, bb, k))
            return (p, o), total

        (p, o), totals = jax.lax.scan(body, (p, o), task_ids)
        return p, o, totals

    task_ids = jnp.asarray([i % 3 for i in range(K)], jnp.int32)
    tc0 = time.perf_counter()
    p2, o2, totals = mixed_scan(params, opt_state, b, task_ids,
                                jax.random.key(0))
    sync(totals)
    scan_compile = time.perf_counter() - tc0
    print("mixed-scan compile:", round(scan_compile, 1), "s")

    p2, o2 = params, opt_state
    p2, o2, totals = mixed_scan(p2, o2, b, task_ids, jax.random.key(1))
    sync(totals)
    ts = time.perf_counter()
    reps = max(args.iters // K, 1)
    for i in range(reps):
        p2, o2, totals = mixed_scan(p2, o2, b, task_ids,
                                    jax.random.key(i))
    sync(totals)
    scan_per_step = (time.perf_counter() - ts) / (reps * K)
    print("mixed-scan s/step:", round(scan_per_step, 4))

    # K individual dispatches on the same round-robin sequence
    p2, o2 = params, opt_state
    ts = time.perf_counter()
    for i in range(reps * K):
        t = tasks[i % 3]
        p2, o2, lv = steps[t](p2, o2, b[t], jax.random.key(i))
    sync(lv["loss"])
    indiv_per_step = (time.perf_counter() - ts) / (reps * K)
    print("individual dispatch s/step (same mix):",
          round(indiv_per_step, 4))

    result = dict(sep_compile=sep_compile, uni_compile=uni_compile,
                  scan_compile=scan_compile, sep_time=sep_time,
                  uni_time=uni_time, mixed_scan_per_step=scan_per_step,
                  individual_per_step=indiv_per_step, k=K,
                  iters=args.iters, config=args.config,
                  device=str(jax.devices()[0].platform))
    print(json.dumps(result))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=2)
    os._exit(0)   # axon teardown can hang


if __name__ == "__main__":
    main()
