"""High-level train/eval APIs.

Capability-equivalent of /root/reference/mtl/apis/train.py: wire model,
datasets, MultiDataLoader, optimizer, runner and hooks together from a
composed config; ``train_model_without_det_eval`` filters det datasets out
of the eval dict (reference train.py:123-221). Also the task-pretrain
loader (reference multitask_learner.py:308-353) for our checkpoint format.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from rscotr_tpu.data import (build_dataloaders, build_datasets,
                             build_multidataloader)
from rscotr_tpu.engine import (CheckpointHook, IterBasedRunner, LogHook,
                               MultiDatasetsEvalHook, TrainStepConfig,
                               build_optimizer, evaluate_results,
                               find_latest_checkpoint, load_checkpoint,
                               make_infer_steps, make_train_step,
                               single_device_test, task_param_masks)
from rscotr_tpu.models import build_model
from rscotr_tpu.models.heads import CdnConfig, DetLossConfig, \
    cdn_self_attn_mask
from rscotr_tpu.utils import get_root_logger


def derive_shapes(cfg) -> Dict[str, tuple]:
    """Static input shapes per task from the data config."""
    shapes = {}
    for name, entry in cfg.data.items():
        task = entry["task"]
        opts = dict(entry.get("loader", {}))
        bs = entry["data"].get("samples_per_gpu", 1)
        if task == "cls":
            s = opts.get("cls_size", 224)
            shapes["cls"] = (bs, s, s, 3)
        elif task == "det":
            bucket = opts.get("det_bucket_hw", (800, 800))
            if isinstance(bucket[0], (tuple, list)):
                # bucket LIST (non-square/keep-ratio pipelines): init on
                # the largest bucket; each bucket compiles its own step
                # lazily at first use (jit retrace per static shape)
                bucket = max(bucket, key=lambda b: b[0] * b[1])
            hb, wb = bucket
            shapes["det"] = (bs, hb, wb, 3)
            shapes["det_max_gt"] = opts.get("max_gt", 100)
        elif task == "seg":
            s = opts.get("seg_size", 512)
            shapes["seg"] = (bs, s, s, 3)
    return shapes


def make_step_config(cfg) -> TrainStepConfig:
    model_cfg = cfg.model
    tw = dict(model_cfg.get("task_weight", {"cls": 1, "det": 1, "seg": 1}))
    cdn_cfg = det_cfg = None
    if model_cfg.get("bbox_head"):
        bh = model_cfg["bbox_head"]
        dn = bh.get("dn_cfg", {}) or {}
        gc = dn.get("group_cfg", {}) or {}
        ns = dn.get("noise_scale", {}) or {}
        max_gt = 100
        for entry in cfg.data.values():
            if entry["task"] == "det":
                max_gt = dict(entry.get("loader", {})).get("max_gt", 100)
        # dn_max_gt: static stand-in for the reference's runtime
        # ``single_pad = max(batch GT count)`` (query_denoising.py:97,121).
        # Default 20 ~ the typical DIOR per-image GT ceiling -> 5 DN groups
        # at num_dn_queries=100 (reference supervision density); clamped to
        # max_gt so tiny test configs keep their shapes.
        cdn_cfg = CdnConfig(
            num_classes=bh.get("num_classes", 20),
            num_queries=bh.get("num_query", 600),
            max_gt=max_gt,
            num_dn_queries=gc.get("num_dn_queries", 100) or 100,
            label_noise_scale=ns.get("label", 0.5),
            box_noise_scale=ns.get("box", 1.0),
            dn_max_gt=min(gc.get("dn_max_gt", 20), max_gt))
        lc = bh.get("loss_cls", {}) or {}
        lb = bh.get("loss_bbox", {}) or {}
        li = bh.get("loss_iou", {}) or {}
        tc = (cfg.model.get("train_cfg", {}) or {}).get("det", {}) or {}
        asn = tc.get("assigner", {}) or {}
        det_cfg = DetLossConfig(
            num_classes=bh.get("num_classes", 20),
            loss_cls_weight=lc.get("loss_weight", 1.0),
            loss_bbox_weight=lb.get("loss_weight", 5.0),
            loss_iou_weight=li.get("loss_weight", 2.0),
            cost_cls_weight=(asn.get("cls_cost", {}) or {}).get(
                "weight", 2.0),
            cost_bbox_weight=(asn.get("reg_cost", {}) or {}).get(
                "weight", 5.0),
            cost_iou_weight=(asn.get("iou_cost", {}) or {}).get(
                "weight", 2.0),
            focal_alpha=lc.get("alpha", 0.25),
            focal_gamma=lc.get("gamma", 2.0))

    cls_cfg = model_cfg.get("cls_head") or {}
    loss_cfg = cls_cfg.get("loss", {}) or {}
    train_cls = (model_cfg.get("train_cfg", {}) or {}).get("cls", {}) or {}
    return TrainStepConfig(
        task_weight=tw,
        cls_num_classes=cls_cfg.get("num_classes", 45),
        cls_label_smooth=loss_cfg.get("label_smooth_val", 0.1),
        cls_use_augments=bool(train_cls.get("augments")),
        seg_ignore_index=255,
        cdn=cdn_cfg, det=det_cfg,
        img_norm=derive_img_norm(cfg),
        device_aug=derive_device_aug(cfg),
        seg_device_aug=derive_seg_device_aug(cfg),
        det_device_aug=derive_det_device_aug(cfg))


def derive_device_aug(cfg):
    """DeviceAugmentConfig for the cls step when a cls loader opts into
    device-side augmentation (loader.cls_device_augment; the pipeline
    rewrite happens in data/build.py)."""
    for entry in cfg.data.values():
        opts = dict(entry.get("loader", {}))
        if entry["task"] != "cls" or not opts.get("cls_device_augment"):
            continue
        from rscotr_tpu.data.pipelines import split_device_augment_cfg
        from rscotr_tpu.ops.device_augment import DeviceAugmentConfig
        dcfg = entry["data"].get("train") or {}
        _, _, kw = split_device_augment_cfg(
            list(dcfg.get("pipeline", []) or []),
            src_size=opts.get("cls_src_size", 256))
        return DeviceAugmentConfig(**kw)
    return None


def derive_det_device_aug(cfg):
    """DetDeviceAugmentConfig when a det loader opts into device-side
    augmentation (loader.det_device_augment)."""
    for entry in cfg.data.values():
        opts = dict(entry.get("loader", {}))
        if entry["task"] != "det" or not opts.get("det_device_augment"):
            continue
        from rscotr_tpu.ops.device_augment import DetDeviceAugmentConfig
        src_hw = opts.get("det_src_hw")
        if src_hw is None:
            bh = opts.get("det_bucket_hw", (800, 800))
            src_hw = max(bh, key=lambda b: b[0] * b[1]) if \
                isinstance(bh[0], (tuple, list)) else bh
        return DetDeviceAugmentConfig(src_hw=tuple(src_hw))
    return None


def derive_seg_device_aug(cfg):
    """SegDeviceAugmentConfig when a seg loader opts into device-side
    augmentation (loader.seg_device_augment)."""
    for entry in cfg.data.values():
        opts = dict(entry.get("loader", {}))
        if entry["task"] != "seg" or not opts.get("seg_device_augment"):
            continue
        from rscotr_tpu.data.pipelines import split_seg_device_augment_cfg
        from rscotr_tpu.ops.device_augment import SegDeviceAugmentConfig
        dcfg = entry["data"].get("train") or {}
        _, _, kw = split_seg_device_augment_cfg(
            list(dcfg.get("pipeline", []) or []),
            src_size=opts.get("seg_src_size", opts.get("seg_size", 512)))
        return SegDeviceAugmentConfig(**kw)
    return None


def derive_img_norm(cfg):
    """(mean, std) for device-side preprocessing, from the Normalize op of
    any dataset whose loader sets device_preprocess (or the cls
    device-augment mode, which implies device-side Normalize). All
    reference datasets share the ImageNet stats; mixed stats would need
    per-task plumbing."""
    found = None
    for entry in cfg.data.values():
        opts = dict(entry.get("loader", {}))
        if not (opts.get("device_preprocess") or
                opts.get("cls_device_augment") or
                opts.get("seg_device_augment") or
                opts.get("det_device_augment")):
            continue
        for split in ("train", "val", "test"):
            dcfg = entry["data"].get(split) or {}
            for op in dcfg.get("pipeline", []) or []:
                if op.get("type") == "Normalize":
                    norm = (tuple(op.get("mean")), tuple(op.get("std")))
                    if found is not None and found != norm:
                        raise ValueError(
                            "device_preprocess with mixed img_norm stats "
                            f"is unsupported: {found} vs {norm}")
                    found = norm
    if found is None:
        # default ImageNet stats (used when pipelines carry no Normalize,
        # e.g. raw-image inference with device_preprocess)
        for entry in cfg.data.values():
            opts = dict(entry.get("loader", {}))
            if opts.get("device_preprocess") or \
                    opts.get("cls_device_augment") or \
                    opts.get("seg_device_augment") or \
                    opts.get("det_device_augment"):
                return ((123.675, 116.28, 103.53),
                        (58.395, 57.12, 57.375))
    return found


def init_model_params(model, cfg, seed: int = 0):
    """Initialize all params by running every configured task once on
    minimal static shapes (batch 1 to keep init cheap)."""
    shapes = derive_shapes(cfg)
    rng = jax.random.key(seed)
    kwargs = {}
    if "cls" in shapes and getattr(model, "cls_head", None) is not None:
        s = shapes["cls"]
        kwargs["cls_img"] = jnp.zeros((1,) + s[1:])
    if "det" in shapes and getattr(model, "bbox_head", None) is not None:
        s = shapes["det"]
        kwargs["det_img"] = jnp.zeros((1,) + s[1:])
        kwargs["det_img_hw"] = jnp.asarray([[s[1], s[2]]], jnp.int32)
        step_cfg = make_step_config(cfg)
        if step_cfg.cdn is not None:
            C = model.bbox_head.embed_dims
            kwargs["dn_label_query"] = jnp.zeros(
                (1, step_cfg.cdn.pad_size, C))
            kwargs["dn_bbox_query"] = jnp.zeros(
                (1, step_cfg.cdn.pad_size, 4))
            kwargs["attn_mask"] = jnp.asarray(
                cdn_self_attn_mask(step_cfg.cdn))
    if "seg" in shapes and getattr(model, "seg_head", None) is not None:
        s = shapes["seg"]
        kwargs["seg_img"] = jnp.zeros((1,) + s[1:])
    return model.init(rng, **kwargs)


def load_task_pretrain(params, pretrain_path: str, rule: str = "dino_mmdet"):
    """Load a single-task DINO checkpoint (our format), remapping its
    bbox_head encoder into shared_encoder (reference
    multitask_learner.py:308-353 behavior for rule 'dino_mmdet')."""
    logger = get_root_logger()
    ck = load_checkpoint(pretrain_path)
    src = ck["params"]["params"] if "params" in ck["params"] else \
        ck["params"]
    dst = jax.tree.map(lambda x: x, params)  # copy structure
    loaded = []
    for top in ("backbone", "neck", "bbox_head", "shared_encoder"):
        if top in src and top in dst["params"]:
            try:
                jax.tree.map(lambda a, b: None, dst["params"][top],
                             src[top])
                dst["params"][top] = src[top]
                loaded.append(top)
            except ValueError:
                logger.warning("task_pretrain: skipping %s "
                               "(structure mismatch)", top)
    logger.info("task_pretrain(%s) loaded: %s", rule, loaded)
    return dst


def make_eval_fn(cfg, model, max_per_img: int = 300,
                 skip_det: bool = False, max_batches: int = 0,
                 mesh=None):
    val_datasets = build_datasets(cfg.data, split="val")
    if not val_datasets:
        val_datasets = build_datasets(cfg.data, split="test")
    if skip_det:
        val_datasets = {k: v for k, v in val_datasets.items()
                        if v.task != "det"}
    loaders = build_dataloaders(val_datasets, cfg.data, train=False)
    infer = make_infer_steps(model, max_per_img=max_per_img,
                             img_norm=derive_img_norm(cfg),
                             seg_test_cfg=(cfg.model.get("test_cfg", {})
                                           or {}).get("seg"))
    eval_kwargs = {t: dict(cfg.get("evaluation", {}).get(t, {}))
                   for t in ("cls", "det", "seg")}

    def eval_fn(runner):
        # Multi-host / sharded-params train-time eval — the reference
        # stubs the distributed case (mtl/apis/train.py:100-101); see
        # engine/test.py adaptive_process_test.
        from rscotr_tpu.engine.test import adaptive_process_test
        results = adaptive_process_test(infer, runner.params, loaders,
                                        max_batches=max_batches, mesh=mesh)
        return evaluate_results(val_datasets, results, eval_kwargs)

    return eval_fn


def resolve_schedule(cfg, epoch_len: int,
                     max_iters_override: Optional[int] = None) -> dict:
    """Resolve the training schedule from either runner flavor.

    ``runner=dict(type='IterBasedRunner', max_iters=N)`` passes through.
    ``runner=dict(type='EpochBasedRunner', max_epochs=N)`` (the reference's
    single-task det 50e / cls 200e configs —
    /root/reference/configs/det/dino_4scale_r50_1x1_50e_dior.py:192,
    runner build /root/reference/mtl/apis/train.py:54-61) converts
    epochs -> iters at build time from the loader length: the TPU hot loop
    stays ONE iter-based jitted step, mmcv's epoch semantics (by_epoch LR
    steps, checkpoint/eval intervals in epochs, per-epoch reshuffles) are
    reproduced by scaling every epoch-denominated knob by
    ``epoch_len`` (epoch reshuffles already happen via
    MultiDataLoader's epoch-bumped re-ignition).
    """
    runner_cfg = dict(cfg.get("runner", {}) or {})
    lr_cfg = dict(cfg.get("lr_config", {}) or {})
    ckpt_cfg = dict(cfg.get("checkpoint_config", {}) or {})
    eval_cfg = dict(cfg.get("evaluation", {}) or {})
    epoch_based = runner_cfg.get("type") == "EpochBasedRunner" or (
        "max_epochs" in runner_cfg and "max_iters" not in runner_cfg)

    if epoch_based:
        epoch_len = max(int(epoch_len), 1)
        max_iters = int(runner_cfg.get("max_epochs", 1)) * epoch_len
        # mmcv LrUpdaterHook: by_epoch defaults True for epoch runners
        if lr_cfg.get("policy") == "step" and lr_cfg.get("by_epoch", True):
            lr_cfg["step"] = [int(s) * epoch_len
                              for s in lr_cfg.get("step", [])]
        # mmcv CheckpointHook / EvalHook intervals are in epochs
        if ckpt_cfg.get("by_epoch", True) and "interval" in ckpt_cfg:
            ckpt_cfg["interval"] = int(ckpt_cfg["interval"]) * epoch_len
        if eval_cfg.get("by_epoch", True) and "interval" in eval_cfg:
            eval_cfg["interval"] = int(eval_cfg["interval"]) * epoch_len
    else:
        max_iters = runner_cfg.get("max_iters", 300000)

    if max_iters_override:
        max_iters = max_iters_override
    lr_cfg.setdefault("max_iters", max_iters)
    return dict(max_iters=max_iters, lr_config=lr_cfg,
                checkpoint_config=ckpt_cfg, evaluation=eval_cfg,
                epoch_based=epoch_based)


def resolve_init_checkpoint(cfg, resume_from, auto_resume, work_dir):
    """mmcv precedence for the initial checkpoint (mtl/apis/train.py +
    reference configs/multi/default_runtime.py:5-6): CLI --resume-from,
    then cfg.resume_from, then --auto-resume discovery — a resume restores
    params+opt_state+iter and always wins over cfg.load_from, which is a
    weights-only init (fresh optimizer, iter 0).

    Returns (resume_path, load_path) — at most one is non-None."""
    if resume_from is None and cfg.get("resume_from"):
        resume_from = cfg.resume_from
    if auto_resume and resume_from is None:
        resume_from = find_latest_checkpoint(work_dir)
    if resume_from:
        return resume_from, None
    return None, cfg.get("load_from") or None


def apply_fp16_cfg(cfg) -> bool:
    """Map the reference's optional ``fp16 = dict(loss_scale=...)`` config
    key (mtl/apis/train.py:66-74 builds an Fp16OptimizerHook from it) to the
    TPU-native equivalent: bf16 compute dtype on the model (params, losses
    and task outputs stay f32). bf16 has the f32 exponent range, so the
    reference's loss_scale is unnecessary and ignored. Returns True when
    the mapping was applied (no-op if the model already sets a dtype)."""
    if cfg.get("fp16") is None or cfg.model.get("compute_dtype"):
        return False
    cfg.model["compute_dtype"] = "bfloat16"
    get_root_logger().info(
        "fp16 config -> bfloat16 compute dtype (TPU-native AMP; "
        "loss_scale ignored: bf16 keeps the f32 exponent range)")
    return True


def train_model(cfg, work_dir: str, seed: int = 0,
                validate: bool = True, resume_from: Optional[str] = None,
                auto_resume: bool = False, load_task_pretrain_path=None,
                skip_det_eval: bool = False, max_iters_override=None,
                num_devices: Optional[int] = None):
    """``num_devices=None`` uses every local device: with >1 device a 1-D
    ``data`` mesh is built, params/opt-state are replicated, each global
    batch (``samples_per_gpu`` × world size, DDP semantics) is sharded on
    its leading axis, and XLA inserts the gradient psums (this subsumes
    the reference's MMDistributedDataParallel — mtl/apis/train.py:37-48)."""
    logger = get_root_logger(os.path.join(work_dir, "train.log"))
    if num_devices is None:
        num_devices = len(jax.devices())
    mesh = None
    if num_devices > 1:
        from rscotr_tpu.parallel import make_mesh
        mesh = make_mesh(num_devices)
        logger.info("data parallel over %d devices (%s)", num_devices,
                    jax.devices()[0].platform)
    apply_fp16_cfg(cfg)
    model = build_model(cfg.model)
    params = init_model_params(model, cfg, seed)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(params["params"]))
    logger.info("model built: %.2fM params", n_params / 1e6)

    if load_task_pretrain_path:
        params = load_task_pretrain(params, load_task_pretrain_path)

    datasets = build_datasets(cfg.data, split="train")
    multi_loader = build_multidataloader(cfg, datasets, seed=seed,
                                         world_size=num_devices)
    epoch_len = sum(len(dl) for dl in multi_loader.loaders.values())
    sched = resolve_schedule(cfg, epoch_len, max_iters_override)
    max_iters = sched["max_iters"]
    if sched["epoch_based"]:
        logger.info("EpochBasedRunner config: %d iters/epoch -> "
                    "max_iters %d", epoch_len, max_iters)
    wf = cfg.get("workflow") or []
    if any(phase != "train" for phase, _ in wf):
        # mmcv workflow val phases compute losses on val data between
        # train chunks; evaluation here is the MultiDatasetsEvalHook
        # (metrics, save-best) — the reference itself only ever runs
        # workflow=[('train',1)] (configs/multi/default_runtime.py:7)
        logger.warning("workflow %s: non-train phases are ignored; "
                       "validation runs via the eval hook "
                       "(cfg.evaluation)", wf)
    momentum_cfg = dict(cfg.get("momentum_config") or {}) or None
    if momentum_cfg:
        # mmcv MomentumUpdaterHook semantics: the schedule drives AdamW's
        # beta1 per step (no reference config sets one, but user configs
        # may — mtl/apis/train.py:82 threads it through to the runner)
        momentum_cfg.setdefault("max_iters", max_iters)
        logger.info("momentum schedule on AdamW beta1: %s", momentum_cfg)
    opt_hook_cfg = dict(cfg.get("optimizer_config", {}) or {})
    cumulative_iters = int(opt_hook_cfg.get("cumulative_iters", 1))
    if cumulative_iters > 1:
        # mmcv GradientCumulativeOptimizerHook: grads averaged over K
        # iters, optimizer stepped every K-th (carried in opt_state —
        # engine/optimizer.py). LR/momentum schedules tick every iter.
        logger.info("gradient accumulation: cumulative_iters=%d",
                    cumulative_iters)
    optimizer = build_optimizer(
        cfg.optimizer, params["params"], lr_config=sched["lr_config"],
        grad_clip=opt_hook_cfg.get("grad_clip"),
        momentum_config=momentum_cfg,
        cumulative_iters=cumulative_iters)
    opt_state = optimizer.init(params["params"])

    cls_head_cfg = cfg.model.get("cls_head") or {}
    masks = task_param_masks(
        params["params"],
        cls_uses_encoder=(cls_head_cfg.get("type") == "MlvlClsHead"))
    step_cfg = make_step_config(cfg)
    tasks_present = {e["task"] for e in cfg.data.values()}
    steps = {t: make_train_step(model, optimizer, t, step_cfg, masks.get(t))
             for t in tasks_present}
    # K-step scanned dispatch (runner.steps_per_dispatch=K): amortizes the
    # per-iteration host dispatch (pytree marshalling) across K same-task
    # steps inside one jitted lax.scan — the production twin of bench.py's
    # scan mode. K=1 keeps the exact per-iteration path.
    steps_per_dispatch = int((cfg.get("runner", {}) or {}).get(
        "steps_per_dispatch", 1))
    scan_steps = None
    if steps_per_dispatch > 1:
        from rscotr_tpu.engine import make_scan_train_step
        scan_steps = {t: make_scan_train_step(model, optimizer, t,
                                              step_cfg, masks.get(t))
                      for t in tasks_present}
        logger.info("scanned dispatch: %d steps per device call",
                    steps_per_dispatch)

    start_step = 0
    resume_from, load_from = resolve_init_checkpoint(
        cfg, resume_from, auto_resume, work_dir)
    if resume_from:
        ck = load_checkpoint(resume_from)
        params = ck["params"]
        if ck.get("opt_state") is not None:
            opt_state = ck["opt_state"]
        start_step = int(ck["meta"].get("iter", 0))
        logger.info("resumed from %s @ iter %d", resume_from, start_step)
    elif load_from:
        # mmcv load_from: weights-only init — fresh optimizer, iter 0
        ck = load_checkpoint(load_from)
        params = ck["params"]
        logger.info("loaded weights (load_from) %s", load_from)

    if mesh is not None:
        par_cfg = cfg.get("parallel", {}) or {}
        if par_cfg.get("fsdp"):
            # ZeRO/FSDP: params + Adam moments sharded over 'data' (see
            # parallel/fsdp.py) — per-device state memory ~1/world_size,
            # update math identical to replicated DP.
            from rscotr_tpu.parallel import (describe_fsdp,
                                             fsdp_param_specs,
                                             shard_opt_state_fsdp,
                                             shard_params_fsdp)
            kw = {}
            if par_cfg.get("fsdp_min_leaf_size") is not None:
                kw["min_leaf_size"] = int(par_cfg["fsdp_min_leaf_size"])
            logger.info(describe_fsdp(params["params"], mesh, **kw))
            inner_specs = fsdp_param_specs(params["params"], mesh, **kw)
            params = shard_params_fsdp(params, mesh, **kw)
            opt_state = shard_opt_state_fsdp(opt_state, inner_specs, mesh)
        else:
            from rscotr_tpu.parallel import replicate_global
            params = replicate_global(params, mesh)
            opt_state = replicate_global(opt_state, mesh)

    runner = IterBasedRunner(steps, params, opt_state, max_iters,
                             rng_seed=seed, start_step=start_step,
                             mesh=mesh,
                             profile_cfg=cfg.get("profile_cfg"),
                             scan_steps=scan_steps,
                             steps_per_dispatch=steps_per_dispatch)
    # context for hooks that introspect the run (mmcv hooks read these off
    # the runner; NumClassCheckHook needs both)
    runner.datasets = datasets
    runner.model_cfg = cfg.model
    log_cfg = cfg.get("log_config", {}) or {}
    runner.register_hook(LogHook(interval=log_cfg.get("interval", 300),
                                 work_dir=work_dir))
    ckpt_cfg = sched["checkpoint_config"]
    classes_meta = {n: list(ds.CLASSES) for n, ds in datasets.items()}
    runner.register_hook(CheckpointHook(
        interval=ckpt_cfg.get("interval", 100000), work_dir=work_dir,
        meta={"CLASSES": classes_meta},
        max_keep_ckpts=ckpt_cfg.get("max_keep_ckpts", -1),
        async_save=bool(ckpt_cfg.get("async_save", False))))
    if validate:
        ev = sched["evaluation"]
        eval_fn = make_eval_fn(
            cfg, model,
            max_per_img=(cfg.model.get("test_cfg", {}) or {}).get(
                "det", {}).get("max_per_img", 300),
            skip_det=skip_det_eval, mesh=mesh)
        runner.register_hook(MultiDatasetsEvalHook(
            eval_fn, interval=ev.get("interval", 15000),
            save_best=ev.get("save_best"), work_dir=work_dir,
            # without-det-eval legitimately drops det save_best keys
            # (reference zero-substitutes them, evaluation.py:145)
            strict_save_best=not skip_det_eval))
    # user hooks from cfg.custom_hooks (reference mtl/apis/train.py:83)
    from rscotr_tpu.engine.hooks import build_custom_hooks
    for hook in build_custom_hooks(cfg.get("custom_hooks")):
        runner.register_hook(hook)

    runner.run(multi_loader)
    return runner


def train_model_without_det_eval(cfg, work_dir: str, **kwargs):
    """Same but det datasets filtered from eval (reference
    train.py:123-221 / :196-198)."""
    kwargs["skip_det_eval"] = True
    return train_model(cfg, work_dir, **kwargs)
