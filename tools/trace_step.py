#!/usr/bin/env python
"""Capture an op-level profiler trace of one task's train/infer step.

Makes the PERF.md "how to get an op-level trace" recipe a one-liner:

    python tools/trace_step.py --task det --mode train
    python tools/trace_step.py --task seg --mode infer --top 30

Runs the flagship-config step a few times under ``jax.profiler`` on the
current backend, parses the resulting ``.xplane.pb`` with xprof's
``hlo_stats`` converter (the tensorboard_plugin_profile converter is broken
against this protobuf build), writes the full per-HLO table to ``--out``
(default /tmp/hlo_stats_{task}_{mode}.json, a list of dicts keyed by
'Total self time (us)' / 'HLO text' / 'Category' / ...), and prints:

* the top ``--top`` HLOs by total self time, and
* a per-category rollup (fusion / convert / copy / all-gather / ...),

which is what exposed the relayout/data-formatting passes behind every
MSDA win this framework has landed (see PERF.md). The reference has no
op-level tracing at all (mmcv IterTimerHook only — SURVEY §5.1).
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rscotr_tpu.utils import (honor_jax_platforms_env,  # noqa: E402
                              setup_compile_cache)

honor_jax_platforms_env()
setup_compile_cache()


def _flagship(root):
    from rscotr_tpu.config import Config
    from rscotr_tpu.data import load_data_cfg
    cfg = Config.fromfile(os.path.join(
        root, "configs/multi/MTL_slvlcls_swin-t-p4-w7_1x1_"
              "resisc_dior_potsdam.py"))
    return load_data_cfg(cfg, config_root=root)


def _batches(task, n, nprng, cfg):
    # shared with tools/benchmark.py so traces correspond exactly to the
    # benchmarked graphs (shapes derive from the config's loader entries)
    from _bench_common import derive_shapes, make_batch_fns
    mk = make_batch_fns(derive_shapes(cfg), nprng,
                        num_classes={"cls": 45, "det": 20, "seg": 5})
    return [mk[task](i) for i in range(n)]


def _rows_from_tool_data(data):
    """Normalize xprof gviz output to a list of plain dicts."""
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data) if isinstance(data, str) else data
    if isinstance(obj, list):          # already a list of dicts
        return obj
    # gviz DataTable: {"cols": [{label,...}], "rows": [{"c": [{"v":..}]}]}
    cols = [c.get("label") or c.get("id") for c in obj["cols"]]
    rows = []
    for r in obj["rows"]:
        rows.append({k: (c or {}).get("v") for k, c in zip(cols, r["c"])})
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=("cls", "det", "seg"), default="det")
    p.add_argument("--mode", choices=("train", "infer"), default="train")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--out", default=None)
    p.add_argument("--trace-dir", default=None)
    args = p.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from rscotr_tpu.apis import make_step_config
    from rscotr_tpu.engine import (build_optimizer, make_infer_steps,
                                   make_train_step, task_param_masks)
    from rscotr_tpu.models import build_model

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = _flagship(root)
    model = build_model(cfg.model)
    step_cfg = make_step_config(cfg)

    nprng = np.random.default_rng(0)
    jrng = jax.random.key(0)
    batches = _batches(args.task, args.iters + 1, nprng, cfg)

    params = model.init(jrng, cls_img=jnp.zeros((1, 224, 224, 3)),
                        det_img=jnp.zeros((1, 800, 800, 3)),
                        det_img_hw=jnp.asarray([[800, 800]], jnp.int32),
                        seg_img=jnp.zeros((1, 512, 512, 3)))

    if args.mode == "train":
        lr_cfg = dict(cfg.get("lr_config", {}) or {})
        lr_cfg.setdefault("max_iters", 1000)
        optimizer = build_optimizer(cfg.optimizer, params["params"],
                                    lr_config=lr_cfg)
        opt_state = optimizer.init(params["params"])
        masks = task_param_masks(params["params"], cls_uses_encoder=False)
        step = make_train_step(model, optimizer, args.task, step_cfg,
                               masks[args.task], donate=False)
        run = lambda b: step(params, opt_state, b, jrng)[2]  # noqa: E731
    else:
        from rscotr_tpu.apis import derive_img_norm
        infer = make_infer_steps(
            model,
            max_per_img=(cfg.model.get("test_cfg", {}) or {}).get(
                "det", {}).get("max_per_img", 300),
            img_norm=derive_img_norm(cfg))[args.task]
        if args.task == "det":
            run = lambda b: infer(  # noqa: E731
                params, b["img"], b["img_hw"],
                jnp.ones((b["img"].shape[0], 4), jnp.float32))
        else:
            run = lambda b: infer(params, b["img"])  # noqa: E731

    def sync(out):
        return np.asarray(jax.tree.leaves(out)[0].ravel()[0])

    sync(run(batches[0]))              # compile outside the trace window

    tdir = args.trace_dir or f"/tmp/trace_{args.task}_{args.mode}"
    os.makedirs(tdir, exist_ok=True)
    jax.profiler.start_trace(tdir)
    t0 = time.perf_counter()
    for b in batches[1:]:
        out = run(b)
    sync(out)
    wall_ms = (time.perf_counter() - t0) / args.iters * 1e3
    jax.profiler.stop_trace()

    planes = sorted(glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    if not planes:
        print(json.dumps({"error": f"no xplane.pb under {tdir}"}))
        return
    from xprof.convert import raw_to_tool_data as r2t
    data, _ = r2t.xspace_to_tool_data([planes[-1]], "hlo_stats", {})
    rows = _rows_from_tool_data(data)

    out_path = args.out or f"/tmp/hlo_stats_{args.task}_{args.mode}.json"
    with open(out_path, "w") as f:
        json.dump(rows, f)

    def fget(row, *keys):
        for k in keys:
            if k in row and row[k] is not None:
                return row[k]
        return 0.0

    def text(row):
        for k in ("HLO text", "hlo_text", "HLO Text", "Op text",
                  "HLO op text", "Op name", "HLO op name"):
            if row.get(k):
                return str(row[k])
        return "?"

    keyed = []
    for r in rows:
        t = float(fget(r, "Total self time (us)", "total_self_time_us",
                       "Total self time (µs)") or 0.0)
        cat = str(r.get("HLO op category") or r.get("Category")
                  or r.get("category") or "?")
        keyed.append((t, cat, text(r)))
    keyed.sort(key=lambda x: -x[0])
    total_us = sum(t for t, _, _ in keyed)

    by_cat = {}
    for t, cat, _ in keyed:
        by_cat[cat] = by_cat.get(cat, 0.0) + t
    print(f"# {args.task} {args.mode}: wall {wall_ms:.1f} ms/step, "
          f"trace total self-time {total_us / 1e3 / args.iters:.1f} "
          f"ms/step over {args.iters} steps -> {out_path}")
    print("\n## by category (ms/step)")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{t / 1e3 / args.iters:9.2f}  {cat}")
    print(f"\n## top {args.top} HLOs (ms/step)")
    for t, cat, txt in keyed[:args.top]:
        print(f"{t / 1e3 / args.iters:9.2f}  [{cat}] {txt[:150]}")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
