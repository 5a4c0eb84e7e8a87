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
  ``start``/``end`` steps and ``logdir``);
* preemption-safe: SIGTERM (the TPU-VM preemption notice; also what
  SLURM/k8s send before a kill) stops the loop at the next step boundary
  and CheckpointHook writes a final checkpoint, so ``--auto-resume``
  continues from the preempted iter instead of the last interval save.
  The reference has no equivalent (SURVEY.md §5.3 — recovery is
  interval-checkpoint auto-resume only).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

from rscotr_tpu.engine.hooks import Hook
from rscotr_tpu.utils import get_root_logger


def host_value(v):
    """Device scalar/array -> host numpy. Multi-host global arrays are not
    fully addressable (np.asarray/float raise) — every process holds a
    replica of loss/log outputs, so read the local shard."""
    if hasattr(v, "is_fully_addressable") and not v.is_fully_addressable:
        return np.asarray(v.addressable_data(0))
    return np.asarray(v)


class IterBasedRunner:
    def __init__(self, train_steps: Dict[str, Callable],
                 params, opt_state, max_iters: int,
                 rng_seed: int = 0, start_step: int = 0,
                 mesh=None, prefetch: int = 2,
                 profile_cfg: Optional[dict] = None,
                 scan_steps: Optional[Dict[str, Callable]] = None,
                 steps_per_dispatch: int = 1,
                 handle_preemption: bool = True):
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
        self.scan_steps = scan_steps or {}
        self.steps_per_dispatch = max(1, int(steps_per_dispatch))
        self.handle_preemption = handle_preemption
        self.preempted = False
        if self.steps_per_dispatch > 1:
            missing = [t for t in train_steps if t not in self.scan_steps]
            assert not missing, \
                f"steps_per_dispatch > 1 needs scan steps for {missing}"
        self._batch_sharding = None
        self._scan_batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._batch_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
            # grouped dispatch: leading K axis replicated, batch axis sharded
            self._scan_batch_sharding = NamedSharding(
                mesh, P(None, mesh.axis_names[0]))

    def register_hook(self, hook: Hook) -> None:
        self._hooks.append(hook)
        self._hooks.sort(key=lambda h: h.priority)

    def _put(self, v):
        """Host-local numpy -> device array.

        Single-process: device_put (sharded over the mesh when set).
        Multi-process: every host holds only its 1/P share of the global
        batch (rank-strided loader) — assemble the global array from the
        process-local shard (``make_array_from_process_local_data``; the
        jax-native replacement for the reference's per-rank DDP batches,
        prepare_loader_args.py:77-93 + train.py:37-48)."""
        if self._batch_sharding is None:
            return jax.device_put(v)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(
                self._batch_sharding, v)
        return jax.device_put(v, self._batch_sharding)

    def _place_batch(self, batch: Dict[str, np.ndarray]):
        import numpy as np
        return {k: self._put(v) if isinstance(v, np.ndarray) else v
                for k, v in batch.items()}

    def _transfer_batch(self, batch):
        """Runs in the prefetch thread: ship every array to the device
        (sharded/assembled over the mesh when one is set) so the h2d
        transfer overlaps the previous step's compute."""
        import numpy as np
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                out[k] = self._put(v)
            else:
                out[k] = v
        return out

    def _make_iter(self, multi_loader):
        from rscotr_tpu.data.loader import PrefetchIterator
        it = iter(multi_loader)
        if self.prefetch and self.prefetch > 0:
            # K-step dispatch consumes draws in bursts of up to K at group
            # assembly; a depth-2 queue would serialize most of that prep
            # into the hot loop (measured: MTL K=8 cls groups stalled
            # 0.2 s/iter on data with depth 2). Deep enough to hold ~2
            # groups so the worker preps during device execution.
            depth = self.prefetch if self.steps_per_dispatch <= 1 else \
                max(self.prefetch, 2 * self.steps_per_dispatch)
            it = PrefetchIterator(it, depth=depth,
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

    def _install_sigterm(self):
        """SIGTERM -> finish the current step, checkpoint, exit cleanly.
        Returns a restore callable (no-op when not installable: non-main
        thread, or handling disabled)."""
        import signal
        import threading

        if not self.handle_preemption or \
                threading.current_thread() is not threading.main_thread():
            return lambda: None

        def _on_sigterm(signum, frame):
            self.preempted = True
            self.logger.warning(
                "SIGTERM received — stopping at the next step boundary "
                "and writing a checkpoint (resume with --auto-resume)")

        prev = signal.signal(signal.SIGTERM, _on_sigterm)
        return lambda: signal.signal(signal.SIGTERM, prev)

    def _should_stop(self) -> bool:
        """Collectively-agreed preemption check at step boundaries.

        SIGTERM may reach only some hosts of a multi-host run; if the
        signaled processes entered the off-interval save (whose
        gather/orbax calls are collectives) while the rest kept training,
        the fleet would deadlock. So each boundary all-reduces the local
        flag (max) and EVERY process adopts the result before deciding to
        stop — all hosts then enter the collective save together."""
        if jax.process_count() == 1 or not self.handle_preemption:
            return self.preempted
        from jax.experimental import multihost_utils
        flags = multihost_utils.process_allgather(
            np.asarray(self.preempted, np.int32))
        if int(np.max(flags)):
            self.preempted = True
        return self.preempted

    def run(self, multi_loader) -> None:
        self.logger.info("start training: iter %d -> %d", self.step,
                         self.max_iters)
        for h in self._hooks:
            h.before_run(self)
        restore = self._install_sigterm()
        try:
            if self.steps_per_dispatch > 1:
                self._run_scanned(multi_loader)
            else:
                self._run_per_iter(multi_loader)
        finally:
            restore()

    def _run_per_iter(self, multi_loader) -> None:
        it = self._make_iter(multi_loader)
        t_last = time.perf_counter()
        while self.step < self.max_iters and not self._should_stop():
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
                 else k): (host_value(v) if jax.process_count() > 1 else v)
                for k, v in log_vars.items()}
            t_now = time.perf_counter()
            self.log_vars["data_time"] = t_data - t_last
            self.log_vars["time"] = t_now - t_last
            t_last = t_now
            for h in self._hooks:
                h.after_train_iter(self)
        for h in self._hooks:
            h.after_run(self)
        self.logger.info("training %s at iter %d",
                         "preempted" if self.preempted else "finished",
                         self.step)

    # ------------------------------------------------------------------
    # K-step scanned dispatch (steps_per_dispatch > 1)
    # ------------------------------------------------------------------

    def _hook_boundary(self, at_step: Optional[int] = None) -> int:
        """Max steps a dispatch group may advance from ``at_step``
        (default: the hook-visible ``self.step``) without crossing a hook
        interval boundary — hooks that fire see exact post-group params
        at exactly their firing step. Hooks that only consume per-step
        ``log_vars`` (scanned out per step anyway) opt out with
        ``scan_boundary = False`` so e.g. a log interval of 5 doesn't cap
        an 8-step dispatch."""
        s = self.step if at_step is None else at_step
        room = self.max_iters - s
        for h in self._hooks:
            if not getattr(h, "scan_boundary", True):
                continue
            iv = getattr(h, "interval", None)
            if isinstance(iv, int) and iv > 0:
                room = min(room, iv - s % iv)
        return max(room, 1)

    def _param_hook_fires_at(self, s: int) -> bool:
        """True when a params-reading (scan_boundary) hook fires at
        global step ``s`` or the run ends there — the deferred-flush
        pipeline must drain before anything reassigns runner params."""
        if s >= self.max_iters:
            return True
        for h in self._hooks:
            if not getattr(h, "scan_boundary", True):
                continue
            iv = getattr(h, "interval", None)
            if isinstance(iv, int) and iv > 0 and s % iv == 0:
                return True
        return False

    def _draw(self, state, multi_loader):
        """One annotated batch; re-ignites the MultiDataLoader on epoch end
        (same semantics as the per-iteration loop)."""
        try:
            return next(state["it"])
        except StopIteration:
            multi_loader.seed_sampler(self.step)
            state["it"] = self._make_iter(multi_loader)
            return next(state["it"])

    def _next_group(self, state, multi_loader, k: int):
        """Collect up to ``k`` batches of ONE (task, dataset) group.

        Looks ahead in the strategy's draw stream, buffering other groups'
        draws for later dispatch: per-dataset sample order is preserved
        exactly; only the global interleaving collapses within the
        lookahead window (any fixed interleaving is as arbitrary as the
        strategy's own — the per-task optimizer masks make the updates
        order-robust). The buffer is FIFO so no group can starve; lookahead
        is bounded to keep at most ~4*k batches resident."""
        buf = state["buf"]
        if not buf:
            buf.append(self._draw(state, multi_loader))

        def gkey(b):
            # batch STATIC SHAPES are part of the group identity:
            # multi-bucket det loaders (det_bucket_hw list) emit
            # different img/out_template shapes, and the CDN group-width
            # ladder varies dn_wide's width — stacking/scanning requires
            # shape-homogeneous groups
            return (b["task"], b["dataset_name"],
                    tuple(getattr(b.get("img"), "shape", ()) or ()),
                    tuple(getattr(b.get("out_template"), "shape", ())
                          or ()),
                    tuple(getattr(b.get("dn_wide"), "shape", ()) or ()))

        key = gkey(buf[0])
        group = [buf.popleft()]
        i = 0
        while len(group) < k and i < len(buf):
            if gkey(buf[i]) == key:
                group.append(buf[i])
                del buf[i]
            else:
                i += 1
        cap = 4 * k
        while len(group) < k and len(buf) < cap:
            b = self._draw(state, multi_loader)
            if gkey(b) == key:
                group.append(b)
            else:
                buf.append(b)
        # Snap the group length down to a power of two (<= k): each
        # distinct (task, n) compiles its own lax.scan graph (10-15 min
        # on a 1-core host), and lookahead-cap partials + interval
        # remainders would otherwise make n wander over 1..K. Snapping
        # bounds the compile set to log2(K)+1 per task; the overflow goes
        # back to the FRONT of the FIFO buffer so it dispatches next with
        # identical per-dataset sample order.
        keep = 1 << (len(group).bit_length() - 1)
        for b in reversed(group[keep:]):
            buf.appendleft(b)
        return key, group[:keep]

    def _stack_group(self, group):
        """Stack K same-shape batches along a new leading axis (device-side
        — leaves already live on device via the prefetch transfer)."""
        import jax.numpy as jnp
        keys = [k for k in group[0] if k not in ("task", "dataset_name")]
        out = {}
        data_axis = (self.mesh.shape[self.mesh.axis_names[0]]
                     if self.mesh is not None else 1)
        for k in keys:
            x = jnp.stack([b[k] for b in group])
            # divisibility by the DATA axis size (not total device count:
            # on a 2-D dp×tp mesh the batch only shards over 'data')
            if self._scan_batch_sharding is not None and \
                    x.shape[1] % data_axis == 0:
                x = jax.device_put(x, self._scan_batch_sharding)
            out[k] = x
        return out

    def _run_scanned(self, multi_loader) -> None:
        """Deferred-flush pipeline: dispatch group N+1 BEFORE reading
        group N's log values off the device. jax dispatch is async, so
        the host's group collection + batch stacking + pytree
        marshalling for N+1 overlap the device's execution of N instead
        of serializing behind a per-dispatch sync (measured ~0.1 s/iter
        of det dispatch gap on the tunnel host, PERF.md round 4). The
        param/opt-state chain lives on device (donated buffers, in-order
        stream), so trajectories are bit-identical to the unpipelined
        loop; only host-side hook PROCESSING lags by one group — and the
        pipeline drains early whenever a params-reading hook fires at a
        group's end (``_param_hook_fires_at``), so checkpoint/eval hooks
        still see exactly their step's params."""
        import collections

        import numpy as np

        K = self.steps_per_dispatch
        state = {"it": self._make_iter(multi_loader),
                 "buf": collections.deque()}
        seen_shapes = set()
        pending = None          # deferred group awaiting host processing
        t_last = time.perf_counter()

        def flush(p):
            nonlocal t_last
            lvs = {k: host_value(v) for k, v in p["lvs"].items()}  # sync
            t_now = time.perf_counter()
            n = p["n"]
            per_step_time = (t_now - t_last) / n
            per_step_data = p["t_collect"] / n
            for i in range(n):
                self.step += 1
                self.log_vars = {
                    (f"{p['task']}.{p['ds']}.{k}"
                     if k not in ("grad_norm",) else k): float(v[i])
                    for k, v in lvs.items()}
                self.log_vars["data_time"] = per_step_data
                self.log_vars["time"] = per_step_time
                for h in self._hooks:
                    h.after_train_iter(self)
            t_last = time.perf_counter()

        dispatched = self.step       # device-side step (>= self.step)
        while dispatched < self.max_iters and not self._should_stop():
            k_eff = min(K, self._hook_boundary(dispatched))
            t0 = time.perf_counter()
            (task, dataset_name, img_shape, *_), group = self._next_group(
                state, multi_loader, k_eff)
            t_collect = time.perf_counter() - t0
            if (task, img_shape, len(group)) not in seen_shapes:
                seen_shapes.add((task, img_shape, len(group)))
                self.logger.info(
                    "scan-dispatch: first (%s, img=%s, n=%d) group — "
                    "compiling a new scan graph (slow once per shape)",
                    task, img_shape, len(group))
            self._maybe_profile()
            batches = self._stack_group(group)
            import jax.numpy as jnp
            n = len(group)
            idxs = jnp.asarray(
                np.arange(dispatched, dispatched + n), jnp.int32)
            self.params, self.opt_state, lvs = self.scan_steps[task](
                self.params, self.opt_state, batches, self._root_key,
                idxs)
            dispatched += n
            if pending is not None:
                flush(pending)
            pending = dict(task=task, ds=dataset_name, n=n, lvs=lvs,
                           t_collect=t_collect)
            if self._param_hook_fires_at(dispatched):
                flush(pending)
                pending = None
        if pending is not None:
            flush(pending)
        for h in self._hooks:
            h.after_run(self)
        self.logger.info("training %s at iter %d",
                         "preempted" if self.preempted else "finished",
                         self.step)
