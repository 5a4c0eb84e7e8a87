#!/usr/bin/env python
"""Training CLI.

Public-surface equivalent of /root/reference/tools/train.py:29-245 — same
flags (config, --work-dir, --load-task-pretrain, --resume-from,
--auto-resume, --no-validate, --seed, --diff-seed, --deterministic,
--cfg-options, --launcher, --auto-scale-lr), config compose + load_data_cfg,
env/seed logging, then train_model. The --launcher flag maps to
jax.distributed (SPMD single-controller; no per-GPU process plumbing).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from rscotr_tpu.config import Config, DictAction, replace_cfg_vals
from rscotr_tpu.data import load_data_cfg
from rscotr_tpu.utils import (collect_env, get_root_logger,
                              honor_jax_platforms_env, set_random_seed,
                              setup_compile_cache)

honor_jax_platforms_env()
setup_compile_cache()


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train the MTL co-training model")
    p.add_argument("config", help="config file path")
    p.add_argument("--work-dir", help="dir to save logs and checkpoints")
    p.add_argument("--load-task-pretrain", action="store_true",
                   help="load single-task pretrain per train_cfg."
                        "task_pretrain")
    p.add_argument("--resume-from", help="checkpoint to resume from")
    p.add_argument("--auto-resume", action="store_true")
    p.add_argument("--no-validate", action="store_true")
    g = p.add_mutually_exclusive_group()
    g.add_argument("--gpus", type=int,
                   help="(deprecated upstream, accepted for parity)")
    g.add_argument("--gpu-ids", type=int, nargs="+",
                   help="(deprecated upstream, accepted for parity)")
    g.add_argument("--gpu-id", type=int, default=0,
                   help="accepted for parity; device placement is managed "
                        "by JAX")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--diff-seed", action="store_true",
                   help="per-host data-seed offset (task schedule stays "
                        "host-synced by construction)")
    p.add_argument("--deterministic", action="store_true",
                   help="accepted for parity; JAX is deterministic by "
                        "default")
    p.add_argument("--options", nargs="+", action=DictAction.action(),
                   help="deprecated alias of --cfg-options (upstream "
                        "tools/train.py:74-80)")
    p.add_argument("--cfg-options", nargs="+", action=DictAction.action())
    p.add_argument("--launcher", default="none",
                   choices=["none", "pytorch", "slurm", "mpi", "jax"])
    p.add_argument("--local_rank", type=int, default=0,
                   help="accepted for torch.distributed.launch command "
                        "compatibility; unused (JAX is single-controller)")
    p.add_argument("--auto-scale-lr", action="store_true")
    p.add_argument("--max-iters", type=int, default=None,
                   help="override runner.max_iters (smoke runs)")
    p.add_argument("--steps-per-dispatch", type=int, default=None,
                   help="override runner.steps_per_dispatch: run K "
                        "same-task steps per jitted lax.scan dispatch "
                        "(amortizes host dispatch; 1 = exact per-iter "
                        "path)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = Config.fromfile(args.config)
    if args.options:
        if args.cfg_options:
            raise ValueError(
                "--options and --cfg-options cannot both be set; "
                "--options is the deprecated alias")
        args.cfg_options = args.options
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    if args.steps_per_dispatch:
        cfg.merge_from_dict(
            {"runner.steps_per_dispatch": args.steps_per_dispatch})
    cfg = load_data_cfg(cfg, config_root=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    cfg.dump(os.path.join(work_dir, os.path.basename(args.config)))

    logger = get_root_logger(os.path.join(work_dir, "train.log"))
    for k, v in collect_env().items():
        logger.info("env: %s = %s", k, v)

    if args.launcher != "none":
        from rscotr_tpu.parallel import initialize_distributed
        initialize_distributed(launcher=args.launcher)

    seed = args.seed if args.seed is not None else 0
    if args.diff_seed:
        import jax
        seed = seed + jax.process_index()
    set_random_seed(seed)
    logger.info("seed=%d deterministic=%s", seed, args.deterministic)

    if args.auto_scale_lr:
        import jax
        base_bs = cfg.get("auto_scale_lr", {}).get("base_batch_size", 16)
        world_bs = sum(e["data"].get("samples_per_gpu", 1)
                       for e in cfg.data.values()) * len(jax.devices())
        cfg.optimizer["lr"] = cfg.optimizer["lr"] * world_bs / base_bs
        logger.info("auto-scaled lr to %g", cfg.optimizer["lr"])

    pretrain = None
    if args.load_task_pretrain:
        tp = (cfg.model.get("train_cfg", {}) or {}).get(
            "task_pretrain", {}) or {}
        pretrain = tp.get("pretrained")
        logger.info("task pretrain: %s (rule=%s)", pretrain,
                    tp.get("rule"))

    from rscotr_tpu.apis import train_model
    train_model(cfg, work_dir, seed=seed,
                validate=not args.no_validate,
                resume_from=args.resume_from,
                auto_resume=args.auto_resume,
                load_task_pretrain_path=pretrain,
                max_iters_override=args.max_iters)


if __name__ == "__main__":
    main()
