"""Runner hooks: logging, checkpointing, multi-dataset evaluation.

Capability-equivalents of the reference's hook stack (SURVEY.md §2.2):
mmcv TextLoggerHook/TensorboardLoggerHook -> LogHook (+MetricsSink),
CheckpointHook -> CheckpointHook, ``MultiDatasetsEvalHook`` + the weighted
multi-metric ``KeyIndicator`` save-best
(/root/reference/mtl/runner/hooks/evaluation.py:9-148).
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Optional

import numpy as np

from rscotr_tpu.config.registry import HOOKS
from rscotr_tpu.engine.checkpoint import save_checkpoint
from rscotr_tpu.utils import MetricsSink, get_root_logger


class Hook:
    priority = 50
    # K-step scanned dispatch: True (default) = dispatch groups must not
    # cross this hook's ``interval`` boundaries (the hook reads
    # runner.params/opt_state at its firing step). Hooks that only read
    # per-step log_vars may set False (runner._hook_boundary).
    scan_boundary = True

    def before_run(self, runner) -> None:
        pass

    def after_train_iter(self, runner) -> None:
        pass

    def after_run(self, runner) -> None:
        pass


# mmcv Priority names, accepted in hook configs (lower fires first).
PRIORITY_NAMES = {
    "HIGHEST": 0, "VERY_HIGH": 10, "HIGH": 30, "ABOVE_NORMAL": 40,
    "NORMAL": 50, "BELOW_NORMAL": 60, "LOW": 70, "VERY_LOW": 90,
    "LOWEST": 100,
}


def build_custom_hooks(custom_hooks_cfg) -> list:
    """Build user hooks from ``cfg.custom_hooks`` (the reference registers
    these through mmcv's runner — /root/reference/mtl/apis/train.py:83).
    Each entry is ``dict(type=Name, priority=..., **kwargs)``; ``priority``
    accepts mmcv names or ints."""
    hooks = []
    for item in (custom_hooks_cfg or []):
        item = dict(item)
        prio = item.pop("priority", None)
        h = HOOKS.build(item)
        if prio is not None:
            h.priority = (PRIORITY_NAMES[prio] if isinstance(prio, str)
                          else int(prio))
        hooks.append(h)
    return hooks


@HOOKS.register_module()
class NumClassCheckHook(Hook):
    """The one custom hook the reference configs actually use
    (/root/reference/configs/_base_/det/default_runtime.py:10 → mmdet's
    NumClassCheckHook): before training, verify each dataset's CLASSES
    count matches its task head's ``num_classes`` — catches config/dataset
    mismatches before 300k iters are spent."""
    _HEAD_KEYS = {"cls": "cls_head", "det": "bbox_head", "seg": "seg_head"}

    def before_run(self, runner) -> None:
        datasets = getattr(runner, "datasets", None) or {}
        model_cfg = getattr(runner, "model_cfg", None) or {}
        for name, ds in datasets.items():
            task = getattr(ds, "task", None)
            classes = getattr(ds, "CLASSES", None)
            head = model_cfg.get(self._HEAD_KEYS.get(task, "")) or {}
            # standalone models carry the head at decode_head/head too
            if not head and task == "seg":
                head = model_cfg.get("decode_head") or {}
            num = head.get("num_classes")
            if num is None or classes is None:
                continue
            if len(classes) != int(num):
                raise ValueError(
                    f"NumClassCheckHook: dataset '{name}' has "
                    f"{len(classes)} CLASSES but the {task} head is "
                    f"configured with num_classes={num}")


class LogHook(Hook):
    priority = 90
    scan_boundary = False   # reads only per-step log_vars, never params

    def __init__(self, interval: int = 300, work_dir: str = "work_dir"):
        self.interval = interval
        self.sink = MetricsSink(work_dir)
        self.logger = get_root_logger()
        self._t0 = time.time()
        self._iter0 = 0

    def after_train_iter(self, runner) -> None:
        if (runner.step % self.interval) != 0 and \
                runner.step != runner.max_iters:
            return
        logs = {k: float(v) for k, v in runner.log_vars.items()}
        dt = time.time() - self._t0
        iters = max(runner.step - self._iter0, 1)
        logs["time"] = dt / iters
        self._t0 = time.time()
        self._iter0 = runner.step
        self.sink.log_scalars(runner.step, logs)
        main = {k: round(v, 4) for k, v in logs.items()
                if k.endswith(".loss")
                or k in ("loss", "time", "data_time", "grad_norm")}
        self.logger.info("iter %d/%d %s", runner.step, runner.max_iters,
                         main)


class CheckpointHook(Hook):
    """``max_keep_ckpts``: mmcv CheckpointHook semantics — keep only the
    newest N ``iter_*`` checkpoints (-1 = keep all); ``best_checkpoint``
    (written by MultiDatasetsEvalHook) is never touched. Save + prune run
    on process 0 only (multi-host shares one work_dir); prune never touches
    checkpoints AHEAD of the current step (stale higher-numbered dirs from
    a previous run sharing the work_dir survive — mmcv deletes only its own
    interval-aligned saves, this is the equivalent guard)."""
    priority = 70

    def __init__(self, interval: int = 100000, work_dir: str = "work_dir",
                 meta: Optional[dict] = None, max_keep_ckpts: int = -1,
                 async_save: bool = False):
        self.interval = interval
        self.work_dir = work_dir
        self.meta = meta or {}
        self.max_keep_ckpts = max_keep_ckpts
        self.async_save = async_save
        self._last_saved = -1

    def _prune(self, current_step: int) -> None:
        if self.max_keep_ckpts <= 0:
            return
        import re
        import shutil
        steps = []
        for d in os.listdir(self.work_dir):
            m = re.fullmatch(r"iter_(\d+)", d)
            if m and os.path.isdir(os.path.join(self.work_dir, d)) and \
                    int(m.group(1)) <= current_step:
                steps.append(int(m.group(1)))
        for s in sorted(steps)[:-self.max_keep_ckpts]:
            try:
                shutil.rmtree(os.path.join(self.work_dir, f"iter_{s}"))
            except OSError:
                get_root_logger().exception(
                    "checkpoint prune failed for iter_%d", s)

    def _save(self, runner) -> None:
        # all processes call save_checkpoint (the host gather inside is a
        # collective); only process 0 writes + prunes (after the commit —
        # on the writer thread when async_save)
        import jax
        step = runner.step
        post = (lambda: self._prune(step)) \
            if jax.process_index() == 0 else None
        save_checkpoint(self.work_dir, step, runner.params,
                        runner.opt_state, meta=self.meta,
                        async_save=self.async_save, post_save=post)
        self._last_saved = step

    def after_train_iter(self, runner) -> None:
        if runner.step % self.interval == 0 or \
                runner.step == runner.max_iters:
            self._save(runner)

    def after_run(self, runner) -> None:
        """Preemption (runner caught SIGTERM): write the off-interval final
        checkpoint so --auto-resume loses zero steps. Always drains any
        in-flight async write so the process never exits mid-checkpoint."""
        from rscotr_tpu.engine.checkpoint import wait_for_async_save
        if getattr(runner, "preempted", False) and \
                self._last_saved != runner.step and runner.step > 0:
            get_root_logger().info(
                "preemption checkpoint @ iter %d", runner.step)
            self._save(runner)
        wait_for_async_save()


class KeyIndicator:
    """Weighted multi-metric save-best key (reference evaluation.py:9-26,
    :144-148): score = sum(weight_i * metrics.get(key_i, 0)) / len(keys) —
    missing keys contribute 0 but still divide, exactly as the reference's
    ``eval_res.get(key, 0.)`` does.

    Strict on configured keys by default: a typo'd ``save_best`` metric
    name raises instead of silently zeroing part of the best-checkpoint
    criterion. Pass ``strict=False`` (the without-det-eval flow does —
    its det keys are legitimately absent) to warn once per missing key
    and keep the reference's zero-substitution."""

    def __init__(self, key_weights: Dict[str, float], strict: bool = True):
        self.key_weights = dict(key_weights)
        self.strict = strict
        self._warned: set = set()

    def __call__(self, metrics: Dict[str, float]) -> float:
        total = 0.0
        for key, w in self.key_weights.items():
            if key in metrics:
                total += w * float(metrics[key])
            elif self.strict:
                raise KeyError(
                    f"save_best metric {key!r} missing from eval metrics "
                    f"{sorted(metrics)} — check the configured key names")
            elif key not in self._warned:
                self._warned.add(key)
                get_root_logger().warning(
                    "save_best metric %r missing from eval metrics %s — "
                    "it contributes 0 to the best score",
                    key, sorted(metrics))
        if not self.key_weights:
            return float("-inf")
        return total / len(self.key_weights)


class MultiDatasetsEvalHook(Hook):
    """Runs multi-dataset evaluation every ``interval`` iters; logs metrics
    prefixed with the dataset name; saves the best checkpoint by
    KeyIndicator (reference evaluation.py:29-148)."""
    priority = 30

    def __init__(self, eval_fn: Callable[[Any], Dict[str, float]],
                 interval: int = 15000,
                 save_best: Optional[Dict[str, float]] = None,
                 work_dir: str = "work_dir",
                 strict_save_best: bool = True):
        self.eval_fn = eval_fn
        self.interval = interval
        self.indicator = (KeyIndicator(save_best, strict=strict_save_best)
                          if save_best else None)
        self.work_dir = work_dir
        self.best_score = float("-inf")
        self.logger = get_root_logger()

    def after_train_iter(self, runner) -> None:
        if runner.step % self.interval != 0 and \
                runner.step != runner.max_iters:
            return
        metrics = self.eval_fn(runner)
        self.logger.info("eval @ iter %d: %s", runner.step,
                         {k: round(float(v), 4)
                          for k, v in metrics.items()})
        runner.log_vars.update(
            {f"val/{k}": v for k, v in metrics.items()})
        if self.indicator is not None:
            score = self.indicator(metrics)
            if score > self.best_score:
                self.best_score = score
                # every process calls (collective host gather inside);
                # process 0 writes
                save_checkpoint(self.work_dir, runner.step,
                                runner.params,
                                meta={"best_score": score,
                                      "metrics": metrics},
                                name="best_checkpoint")
                self.logger.info("new best score %.4f @ iter %d", score,
                                 runner.step)


for _h in (LogHook, CheckpointHook, MultiDatasetsEvalHook):
    HOOKS.register_module(module=_h)
