"""K-step scanned dispatch (runner.steps_per_dispatch).

VERDICT round-1 item #3: the production runner paid full per-iteration
host-dispatch cost; the fix groups K same-(task, dataset) draws into ONE
jitted ``lax.scan`` (engine/train_step.py::make_scan_train_step +
engine/runner.py::_run_scanned). Contracts tested here:

* a K-grouped run of a single-task stream is BIT-IDENTICAL to the
  per-iteration path (same rng stream: fold_in(root, global_step));
* multi-task lookahead grouping preserves per-dataset sample order;
* dispatch groups never cross a hook interval boundary, so hooks fire at
  exact steps with exact params.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import flax.linen as nn

from rscotr_tpu.data import MultiDataLoader, TaskDataLoader, strategies_map
from rscotr_tpu.engine import (IterBasedRunner, TrainStepConfig,
                               build_optimizer, make_scan_train_step,
                               make_train_step)
from rscotr_tpu.engine.hooks import Hook


class _MiniCls(nn.Module):
    """Smallest model exposing the forward_cls surface the step fns use."""
    num_classes: int = 7

    def setup(self):
        self.head = nn.Dense(self.num_classes)

    def __call__(self, img, deterministic=True):
        return self.forward_cls(img, deterministic)

    def forward_cls(self, img, deterministic=True):
        return self.head(img.mean(axis=(1, 2)))


class _SeqClsDataset:
    """Labels encode the sample index so order is observable."""
    task = "cls"
    CLASSES = tuple(f"c{i}" for i in range(7))

    def __init__(self, length=16, img_size=8):
        self.length = length
        self.img_size = img_size

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        rng = np.random.Generator(np.random.PCG64(idx))
        img = rng.uniform(0, 1, (self.img_size, self.img_size, 3)
                          ).astype(np.float32)
        return {"img": img, "gt_label": np.int32(idx % 7)}


def _collate(samples):
    return {"img": np.stack([s["img"] for s in samples]),
            "gt_label": np.asarray([s["gt_label"] for s in samples],
                                   np.int32)}


def _single_task_loader():
    ds = _SeqClsDataset()
    dl = TaskDataLoader(ds, 2, collate_fn=_collate, num_threads=1,
                        shuffle=False)
    loaders = {"resisc": dl}
    return MultiDataLoader(loaders, strategies_map["round_robin"](loaders))


class TestScanBitIdentical:
    def _run(self, steps_per_dispatch, n_iters=8):
        model = _MiniCls()
        params = model.init(jax.random.key(0),
                            jnp.zeros((2, 8, 8, 3)))
        cfg = TrainStepConfig(task_weight={"cls": 1.0}, cls_num_classes=7,
                              cls_use_augments=False)
        opt = build_optimizer(dict(type="AdamW", lr=1e-2,
                                   weight_decay=1e-4),
                              params["params"],
                              lr_config=dict(policy="fixed"))
        opt_state = opt.init(params["params"])
        steps = {"cls": make_train_step(model, opt, "cls", cfg,
                                        donate=False)}
        scan_steps = {"cls": make_scan_train_step(model, opt, "cls", cfg,
                                                  donate=False)}
        runner = IterBasedRunner(
            steps, params, opt_state, n_iters, rng_seed=42,
            prefetch=0, scan_steps=scan_steps,
            steps_per_dispatch=steps_per_dispatch)
        runner.run(_single_task_loader())
        return runner

    def test_k4_matches_k1_exactly(self):
        r1 = self._run(1)
        r4 = self._run(4)
        assert r1.step == r4.step == 8
        a = jax.tree.leaves(r1.params)
        b = jax.tree.leaves(r4.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_k_not_dividing_max_iters(self):
        r = self._run(3, n_iters=8)   # groups 3+3+2
        assert r.step == 8


class _RecordingScanStep:
    """Fake scan step capturing group composition."""

    def __init__(self, record, tag):
        self.record = record
        self.tag = tag

    def __call__(self, params, opt_state, batches, root_key, idxs):
        labels = np.asarray(batches["gt_label"])    # (K, B)
        self.record.append((self.tag, np.asarray(idxs).tolist(),
                            labels[:, 0].tolist()))
        k = len(np.asarray(idxs))
        return params, opt_state, {"loss": jnp.zeros(k)}


class _BoundaryHook(Hook):
    def __init__(self, interval):
        self.interval = interval
        self.fired_at = []

    def after_train_iter(self, runner):
        if runner.step % self.interval == 0 or \
                runner.step == runner.max_iters:
            self.fired_at.append(runner.step)


def _two_task_loader():
    class _IdxClsDataset(_SeqClsDataset):
        """gt_label = raw sample index (loss never computed here)."""

        def __getitem__(self, idx):
            s = super().__getitem__(idx)
            s["gt_label"] = np.int32(idx)
            return s

    class _IdxSegDataset(_IdxClsDataset):
        task = "seg"

    cls_dl = TaskDataLoader(_IdxClsDataset(), 2, collate_fn=_collate,
                            num_threads=1, shuffle=False)
    seg_dl = TaskDataLoader(_IdxSegDataset(), 2, collate_fn=_collate,
                            num_threads=1, shuffle=False)
    loaders = {"a": cls_dl, "b": seg_dl}
    return MultiDataLoader(loaders, strategies_map["round_robin"](loaders))


class TestGroupingSemantics:
    def _runner(self, record, K, max_iters, hooks=()):
        steps = {"cls": lambda *a: None, "seg": lambda *a: None}
        scan_steps = {"cls": _RecordingScanStep(record, "cls"),
                      "seg": _RecordingScanStep(record, "seg")}
        r = IterBasedRunner(steps, {"p": jnp.zeros(1)}, {"o": jnp.zeros(1)},
                            max_iters, prefetch=0, scan_steps=scan_steps,
                            steps_per_dispatch=K)
        for h in hooks:
            r.register_hook(h)
        return r

    def test_per_dataset_order_preserved(self):
        """Round-robin alternates a/b; K=4 lookahead groups 4 of each, and
        each dataset's first-sample labels stay in dataset order."""
        record = []
        r = self._runner(record, K=4, max_iters=16)
        r.run(_two_task_loader())
        assert r.step == 16
        for tag in ("cls", "seg"):
            firsts = [lab for t, _, labs in record if t == tag
                      for lab in labs]
            # batches of 2 from a 16-long unshuffled ds: first labels
            # 0, 2, 4, ... in order
            assert firsts == sorted(firsts)
            assert firsts[0] == 0

    def test_groups_respect_hook_boundaries(self):
        """interval=3 hook: no dispatch group may cross a multiple of 3."""
        record = []
        hook = _BoundaryHook(3)
        r = self._runner(record, K=4, max_iters=12, hooks=[hook])
        r.run(_two_task_loader())
        for _, idxs, _ in record:
            lo, hi = idxs[0], idxs[-1]
            # all steps of a group fall inside one (m*3, (m+1)*3] window
            assert (lo // 3) == (hi // 3), (lo, hi)
        assert hook.fired_at == [3, 6, 9, 12]

    def test_scan_boundary_optout_does_not_cap_groups(self):
        """A hook with scan_boundary=False (e.g. LogHook — per-step
        log_vars only) must not limit dispatch group size; one WITH
        boundaries still does."""
        class _LogLike(_BoundaryHook):
            scan_boundary = False

        record = []
        hook = _LogLike(3)
        r = self._runner(record, K=4, max_iters=16, hooks=[hook])
        r.run(_two_task_loader())
        sizes = sorted({len(idxs) for _, idxs, _ in record})
        assert sizes == [4]        # full K groups despite interval=3
        # per-step after_train_iter still fired at every multiple of 3
        assert hook.fired_at == [3, 6, 9, 12, 15, 16]

    def test_global_steps_cover_range_once(self):
        record = []
        r = self._runner(record, K=4, max_iters=10)
        r.run(_two_task_loader())
        all_idxs = sorted(i for _, idxs, _ in record for i in idxs)
        assert all_idxs == list(range(10))
