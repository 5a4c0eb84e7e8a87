"""IterBasedRunner equivalent: the co-training hot loop.

Capability-equivalent of mmcv IterBasedRunner driving
``MultiDataLoader`` -> ``model.train_step`` per iteration
(SURVEY.md §3.1 hot loop), redesigned TPU-first:

* one JITTED step function per task, selected host-side from the batch's
  ``task`` tag (the task sequence is a host-side function of the global
  step, identical on all hosts — SURVEY.md §5.8);
* batches stream through a prefetch thread; device transfer happens inside
  jit (donated params/opt state keep HBM flat);
* hooks fire after each step (log/checkpoint/eval).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

from rscotr_tpu.engine.hooks import Hook
from rscotr_tpu.utils import get_root_logger


class IterBasedRunner:
    def __init__(self, train_steps: Dict[str, Callable],
                 params, opt_state, max_iters: int,
                 rng_seed: int = 0, start_step: int = 0):
        self.train_steps = train_steps
        self.params = params
        self.opt_state = opt_state
        self.max_iters = max_iters
        self.step = start_step
        self.log_vars: Dict[str, float] = {}
        self._hooks: List[Hook] = []
        self._root_key = jax.random.key(rng_seed)
        self.logger = get_root_logger()

    def register_hook(self, hook: Hook) -> None:
        self._hooks.append(hook)
        self._hooks.sort(key=lambda h: h.priority)

    def run(self, multi_loader) -> None:
        self.logger.info("start training: iter %d -> %d", self.step,
                         self.max_iters)
        it = iter(multi_loader)
        while self.step < self.max_iters:
            try:
                batch = next(it)
            except StopIteration:
                multi_loader.seed_sampler(self.step)
                it = iter(multi_loader)
                batch = next(it)
            task = batch.pop("task")
            dataset_name = batch.pop("dataset_name")
            step_rng = jax.random.fold_in(self._root_key, self.step)
            self.params, self.opt_state, log_vars = self.train_steps[task](
                self.params, self.opt_state, batch, step_rng)
            self.step += 1
            # namespace log vars like the reference:
            # '{task}.{dataset_name}.{loss_name}'
            self.log_vars = {
                (f"{task}.{dataset_name}.{k}" if k not in ("grad_norm",)
                 else k): v
                for k, v in log_vars.items()}
            for h in self._hooks:
                h.after_train_iter(self)
        for h in self._hooks:
            h.after_run(self)
        self.logger.info("training finished at iter %d", self.step)
