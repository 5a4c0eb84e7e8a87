#!/usr/bin/env python
"""Overfit-to-metric proof: fit a fixed 8-image synthetic set per task and
drive the REAL eval stack to ceiling (VERDICT round-1 item #4).

Targets (val == train by construction):
  cls  resisc.accuracy_top-1 >= 100 (percent)
  det  dior.bbox_mAP_50      >= 0.9 (fraction)
  seg  potsdam.mIoU          >= 90  (percent)

This validates the full loss/matcher/CDN/focal/eval machinery end-to-end —
the offline analog of the reference's published metrics (BASELINE.md's
checkpoint protocol is egress-blocked). Writes a markdown log with the
iteration count at which each target was first met.

Usage (TPU or CPU):
  python tools/overfit_proof.py --work-dir /tmp/overfit \
      --eval-every 200 --max-iters 4000 --log OVERFIT_PROOF.md
"""

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from rscotr_tpu.utils import (get_root_logger, honor_jax_platforms_env,
                              setup_compile_cache)

honor_jax_platforms_env()
setup_compile_cache()

# accuracy/mIoU come out of the eval stack in PERCENT (mmcv convention);
# COCO-style mAP is a 0-1 fraction
TARGETS = {
    "resisc.accuracy_top-1": 100.0,
    "dior.bbox_mAP_50": 0.9,
    "potsdam.mIoU": 90.0,
}


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs/multi/MTL_overfit_proof.py"))
    p.add_argument("--work-dir", default="work_dirs/overfit_proof")
    p.add_argument("--eval-every", type=int, default=200)
    p.add_argument("--max-iters", type=int, default=4000)
    p.add_argument("--log", default=None,
                   help="markdown log path (default <work-dir>/proof.md)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.work_dir, exist_ok=True)
    logger = get_root_logger(os.path.join(args.work_dir, "overfit.log"))

    import jax
    from rscotr_tpu.apis import (init_model_params, make_eval_fn,
                                 make_step_config)
    from rscotr_tpu.config import Config
    from rscotr_tpu.data import (build_datasets, build_multidataloader,
                                 load_data_cfg)
    from rscotr_tpu.engine import (IterBasedRunner, build_optimizer,
                                   make_train_step, task_param_masks)
    from rscotr_tpu.models import build_model

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(args.config)
    cfg = load_data_cfg(cfg, config_root=root)

    model = build_model(cfg.model)
    params = init_model_params(model, cfg, args.seed)
    optimizer = build_optimizer(
        cfg.optimizer, params["params"],
        lr_config=dict(cfg.get("lr_config") or {"policy": "fixed"},
                       max_iters=args.max_iters),
        grad_clip=(cfg.get("optimizer_config", {}) or {}).get("grad_clip"))
    opt_state = optimizer.init(params["params"])
    masks = task_param_masks(params["params"], cls_uses_encoder=False)
    step_cfg = make_step_config(cfg)
    steps = {t: make_train_step(model, optimizer, t, step_cfg, masks.get(t))
             for t in ("cls", "det", "seg")}
    datasets = build_datasets(cfg.data, split="train")
    eval_fn = make_eval_fn(cfg, model)

    runner = IterBasedRunner(steps, params, opt_state,
                             max_iters=args.eval_every, rng_seed=args.seed)
    ml = build_multidataloader(cfg, datasets, seed=args.seed)

    first_met = {}
    history = []
    while runner.step < args.max_iters:
        runner.max_iters = min(runner.step + args.eval_every,
                               args.max_iters)
        runner.run(ml)
        metrics = eval_fn(runner)
        history.append((runner.step, metrics))
        logger.info("iter %d metrics: %s", runner.step,
                    {k: round(v, 4) for k, v in metrics.items()
                     if k in TARGETS})
        for k, thr in TARGETS.items():
            if k not in first_met and metrics.get(k, 0.0) >= thr:
                first_met[k] = runner.step
                logger.info("TARGET MET: %s >= %.2f at iter %d",
                            k, thr, runner.step)
        if len(first_met) == len(TARGETS):
            break

    final = history[-1][1] if history else {}
    ok = len(first_met) == len(TARGETS)
    log_path = args.log or os.path.join(args.work_dir, "proof.md")
    with open(log_path, "w") as f:
        f.write("# Overfit-to-metric proof\n\n")
        f.write(f"Run: {datetime.datetime.now().isoformat()} on "
                f"`{jax.devices()[0].platform}` "
                f"({len(jax.devices())} device(s)), config "
                f"`{os.path.relpath(args.config, root)}`, "
                f"eval every {args.eval_every}, cap {args.max_iters} "
                f"iters.\n\n")
        f.write("Fixed 8-image synthetic set per task, val == train; "
                "metrics through the real eval stack "
                "(engine/test.py + dataset.evaluate).\n\n")
        f.write("| target | threshold | first met at iter | final |\n")
        f.write("|---|---|---|---|\n")
        for k, thr in TARGETS.items():
            f.write(f"| {k} | {thr} | "
                    f"{first_met.get(k, 'NOT MET')} | "
                    f"{final.get(k, float('nan')):.4f} |\n")
        f.write("\n## Metric trajectory\n\n```\n")
        for it, m in history:
            f.write(f"iter {it}: " + json.dumps(
                {k: round(m.get(k, 0.0), 4) for k in TARGETS}) + "\n")
        f.write("```\n")
    logger.info("proof %s -> %s", "COMPLETE" if ok else "INCOMPLETE",
                log_path)
    print(json.dumps({"ok": ok, "first_met": first_met,
                      "final": {k: final.get(k) for k in TARGETS}}))
    # axon teardown can hang; results are flushed
    sys.stdout.flush()
    os._exit(0 if ok else 1)


if __name__ == "__main__":
    main()
