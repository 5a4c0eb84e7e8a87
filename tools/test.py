#!/usr/bin/env python
"""Evaluation CLI.

Public-surface equivalent of /root/reference/tools/test.py:89-226: compose
config, build test datasets (--tasks subset filter), load checkpoint
(CLASSES from meta), run inference, per-dataset evaluate() with task-scoped
eval kwargs, dump metrics JSON; --test_outputs reuses cached raw outputs.
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from rscotr_tpu.config import Config, DictAction
from rscotr_tpu.data import build_dataloaders, build_datasets, load_data_cfg
from rscotr_tpu.utils import (get_root_logger, honor_jax_platforms_env,
                              setup_compile_cache)

honor_jax_platforms_env()
setup_compile_cache()


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate the MTL model")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--tasks", nargs="+", default=["cls", "det", "seg"],
                   choices=["cls", "det", "seg"])
    p.add_argument("--out", help="dump raw outputs pickle")
    p.add_argument("--test_outputs", help="reuse cached raw outputs pickle")
    p.add_argument("--eval-out", help="metrics json path")
    p.add_argument("--show", action="store_true",
                   help="paint results (headless: saves into --show-dir, "
                        "default <work_dir>/painted)")
    p.add_argument("--show-dir",
                   help="directory where painted images will be saved")
    p.add_argument("--show-score-thr", type=float, default=0.3,
                   help="det score threshold for painted boxes")
    p.add_argument("--max-batches", type=int, default=0)
    p.add_argument("--cfg-options", nargs="+", action=DictAction.action())
    p.add_argument("--work-dir",
                   help="directory for evaluation metrics / formatted "
                        "results (reference tools/test.py:33-34)")
    p.add_argument("--eval", nargs="+",
                   help="metric names passed to dataset.evaluate "
                        "(e.g. bbox / mIoU mFscore / accuracy)")
    p.add_argument("--format-only", action="store_true",
                   help="write submission-format results (COCO det json, "
                        "seg label PNGs) and skip evaluation")
    p.add_argument("--launcher", default="none",
                   choices=["none", "jax", "pytorch", "slurm", "mpi"],
                   help="multi-host eval init (jax.distributed; results "
                        "gather via process_allgather)")
    # accepted for reference command-line compatibility; device selection
    # and result collection are JAX-native here
    p.add_argument("--gpu-id", type=int, default=0, help=argparse.SUPPRESS)
    p.add_argument("--gpu-collect", action="store_true",
                   help=argparse.SUPPRESS)
    p.add_argument("--tmpdir", help=argparse.SUPPRESS)
    p.add_argument("--local_rank", type=int, default=0,
                   help=argparse.SUPPRESS)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    cfg = load_data_cfg(cfg, config_root=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    if args.launcher != "none":
        from rscotr_tpu.parallel import initialize_distributed
        initialize_distributed(args.launcher)
    log_file = (os.path.join(args.work_dir, "test.log")
                if args.work_dir else None)
    logger = get_root_logger(log_file)

    # task subset filter (reference test.py:30-31,153-158)
    for name in list(cfg.data.keys()):
        if cfg.data[name]["task"] not in args.tasks:
            del cfg.data[name]

    datasets = build_datasets(cfg.data, split="test")
    if not datasets:
        datasets = build_datasets(cfg.data, split="val")
    loaders = build_dataloaders(datasets, cfg.data, train=False)

    from rscotr_tpu.apis import make_step_config  # noqa: F401
    from rscotr_tpu.engine import (evaluate_results, load_checkpoint,
                                   make_infer_steps, multi_process_test)
    from rscotr_tpu.models import build_model

    model = build_model(cfg.model)
    ck = load_checkpoint(args.checkpoint)
    params = ck["params"]
    if ck["meta"].get("CLASSES"):
        logger.info("checkpoint CLASSES meta: %s",
                    {k: len(v) for k, v in ck["meta"]["CLASSES"].items()})

    if args.test_outputs and os.path.isfile(args.test_outputs):
        with open(args.test_outputs, "rb") as f:
            results = pickle.load(f)
        logger.info("loaded cached outputs from %s", args.test_outputs)
    else:
        max_per_img = (cfg.model.get("test_cfg", {}) or {}).get(
            "det", {}).get("max_per_img", 300)
        from rscotr_tpu.apis import derive_img_norm
        infer = make_infer_steps(model, max_per_img=max_per_img,
                                 img_norm=derive_img_norm(cfg),
                                 seg_test_cfg=(cfg.model.get("test_cfg", {})
                                               or {}).get("seg"))
        results = multi_process_test(infer, params, loaders,
                                     max_batches=args.max_batches)
        if args.out:
            with open(args.out, "wb") as f:
                pickle.dump(results, f)

    if args.show or args.show_dir:
        # reference tools/test.py:54-56,184 -> single_gpu_test(show,
        # show_dir) -> MTL.show_result; headless TPU hosts always paint
        # to disk
        from rscotr_tpu.utils import save_eval_visualizations
        show_dir = args.show_dir or os.path.join(args.work_dir or ".",
                                                 "painted")
        n = save_eval_visualizations(datasets, results, show_dir,
                                     score_thr=args.show_score_thr)
        logger.info("painted %d result images into %s", n, show_dir)

    if args.format_only:
        # reference tools/test.py:44-47,206-208: write submission-format
        # results and skip evaluation
        out_dir = args.work_dir or "formatted"
        for name, ds in datasets.items():
            paths = ds.format_results(results.get(name, []), out_dir)
            logger.info("formatted %s -> %s", name,
                        paths[0] if len(paths) == 1
                        else f"{len(paths)} files in {out_dir}")
        return

    eval_kwargs = {t: dict(cfg.get("evaluation", {}).get(t, {}))
                   for t in ("cls", "det", "seg")}
    if args.eval:
        # explicit metric names (reference tools/test.py:48-53). The
        # reference applies metrics per dataset; here each known metric
        # name routes to its task so `--eval bbox` with the default
        # --tasks doesn't crash cls/seg evaluation. Unknown names go to
        # every selected task (matching the old behavior for custom
        # metrics).
        metric_task = {"accuracy": "cls", "support": "cls",
                       "precision": "cls", "recall": "cls",
                       "f1_score": "cls",
                       "bbox": "det", "proposal": "det",
                       "proposal_fast": "det",
                       "mIoU": "seg", "mDice": "seg", "mFscore": "seg"}
        per_task = {}
        for m in args.eval:
            t = metric_task.get(m)
            for tt in ([t] if t else list(args.tasks)):
                per_task.setdefault(tt, []).append(m)
        for t, ms in per_task.items():
            if t not in args.tasks:
                logger.warning("--eval %s targets task %r which is not "
                               "in --tasks; ignoring", ms, t)
                continue
            kw = eval_kwargs.setdefault(t, {})
            kw["metric"] = ms[0] if len(ms) == 1 else tuple(ms)
    # cached-output runs may legitimately cover a dataset subset; live
    # inference covering zero samples of a selected dataset is an error
    metrics = evaluate_results(datasets, results, eval_kwargs,
                               allow_empty=bool(args.test_outputs))
    logger.info("metrics: %s", json.dumps(metrics, indent=2))
    out_path = args.eval_out or (
        os.path.join(args.work_dir, "eval_metrics.json")
        if args.work_dir else "eval_metrics.json")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(metrics, f, indent=2)
    logger.info("metrics written to %s", out_path)


if __name__ == "__main__":
    main()
