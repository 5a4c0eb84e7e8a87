"""IterBasedRunner equivalent: the co-training hot loop.

Capability-equivalent of mmcv IterBasedRunner driving
``MultiDataLoader`` -> ``model.train_step`` per iteration
(SURVEY.md §3.1 hot loop), redesigned TPU-first:

* one JITTED step function per task, selected host-side from the batch's
  ``task`` tag (the task sequence is a host-side function of the global
  step, identical on all hosts — SURVEY.md §5.8);
* batches stream through a background prefetch thread
  (``PrefetchIterator``); per-step ``data_time`` vs ``time`` are logged
  like mmcv's IterTimerHook (SURVEY.md §5.1);
* when a ``mesh`` is given, each global batch is sharded on its leading
  axis over the mesh's ``data`` axis before the step (params stay
  replicated; gradient psums are inserted by XLA — this subsumes the
  reference's DDP all-reduce, multitask_learner.py:289-304);
* hooks fire after each step (log/checkpoint/eval);
* optional ``jax.profiler`` trace window (``profile_cfg`` with
  ``start``/``end`` steps and ``logdir``).
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
                 rng_seed: int = 0, start_step: int = 0,
                 mesh=None, prefetch: int = 2,
                 profile_cfg: Optional[dict] = None):
        self.train_steps = train_steps
        self.params = params
        self.opt_state = opt_state
        self.max_iters = max_iters
        self.step = start_step
        self.log_vars: Dict[str, float] = {}
        self._hooks: List[Hook] = []
        self._root_key = jax.random.key(rng_seed)
        self.logger = get_root_logger()
        self.mesh = mesh
        self.prefetch = prefetch
        self.profile_cfg = dict(profile_cfg or {})
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._batch_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))

    def register_hook(self, hook: Hook) -> None:
        self._hooks.append(hook)
        self._hooks.sort(key=lambda h: h.priority)

    def _place_batch(self, batch: Dict[str, np.ndarray]):
        if self._batch_sharding is None:
            return batch
        return {k: jax.device_put(v, self._batch_sharding)
                for k, v in batch.items()}

    def _transfer_batch(self, batch):
        """Runs in the prefetch thread: ship every array to the device
        (sharded over the mesh when one is set) so the h2d transfer
        overlaps the previous step's compute."""
        import numpy as np
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                out[k] = (jax.device_put(v, self._batch_sharding)
                          if self._batch_sharding is not None
                          else jax.device_put(v))
            else:
                out[k] = v
        return out

    def _make_iter(self, multi_loader):
        from rscotr_tpu.data.loader import PrefetchIterator
        it = iter(multi_loader)
        if self.prefetch and self.prefetch > 0:
            it = PrefetchIterator(it, depth=self.prefetch,
                                  transfer_fn=self._transfer_batch)
        return it

    def _maybe_profile(self):
        pc = self.profile_cfg
        if not pc:
            return
        if self.step == pc.get("start", -1):
            logdir = pc.get("logdir", "/tmp/jax_trace")
            self.logger.info("profiler: start_trace -> %s", logdir)
            jax.profiler.start_trace(logdir)
        if self.step == pc.get("end", -1):
            jax.profiler.stop_trace()
            self.logger.info("profiler: stop_trace")

    def run(self, multi_loader) -> None:
        self.logger.info("start training: iter %d -> %d", self.step,
                         self.max_iters)
        it = self._make_iter(multi_loader)
        t_last = time.perf_counter()
        while self.step < self.max_iters:
            try:
                batch = next(it)
            except StopIteration:
                multi_loader.seed_sampler(self.step)
                it = self._make_iter(multi_loader)
                batch = next(it)
            t_data = time.perf_counter()
            self._maybe_profile()
            task = batch.pop("task")
            dataset_name = batch.pop("dataset_name")
            batch = self._place_batch(batch)
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
            t_now = time.perf_counter()
            self.log_vars["data_time"] = t_data - t_last
            self.log_vars["time"] = t_now - t_last
            t_last = t_now
            for h in self._hooks:
                h.after_train_iter(self)
        for h in self._hooks:
            h.after_run(self)
        self.logger.info("training finished at iter %d", self.step)
