"""Runner-hook behaviors that don't need a model."""

import os
import types

import numpy as np


class TestCheckpointHookMaxKeep:
    def test_max_keep_ckpts_prunes_oldest(self, tmp_path):
        """mmcv CheckpointHook max_keep_ckpts semantics: only the newest N
        iter_* checkpoints survive; best_checkpoint is never pruned and
        last_checkpoint keeps pointing at the newest."""
        from rscotr_tpu.engine import (CheckpointHook,
                                       find_latest_checkpoint,
                                       save_checkpoint)
        wd = str(tmp_path / "wd")
        params = {"w": np.zeros(3, np.float32)}
        save_checkpoint(wd, 7, params, meta={"best_score": 1.0},
                        name="best_checkpoint")
        hook = CheckpointHook(interval=1, work_dir=wd, max_keep_ckpts=2)
        runner = types.SimpleNamespace(params=params, opt_state=None,
                                       max_iters=100)
        for step in (1, 2, 3, 4):
            runner.step = step
            hook.after_train_iter(runner)
        kept = sorted(d for d in os.listdir(wd) if d.startswith("iter_"))
        assert kept == ["iter_3", "iter_4"]
        assert os.path.isdir(os.path.join(wd, "best_checkpoint"))
        latest = find_latest_checkpoint(wd)
        assert latest and latest.endswith("iter_4")

    def test_prune_spares_checkpoints_ahead_of_current_step(self, tmp_path):
        """Stale higher-numbered checkpoints from a previous run sharing the
        work_dir are never deleted (only steps <= the current run's step
        are prune candidates)."""
        from rscotr_tpu.engine import CheckpointHook, save_checkpoint
        wd = str(tmp_path / "wd")
        params = {"w": np.zeros(3, np.float32)}
        save_checkpoint(wd, 50, params)   # stale leftover, "future" step
        hook = CheckpointHook(interval=1, work_dir=wd, max_keep_ckpts=1)
        runner = types.SimpleNamespace(params=params, opt_state=None,
                                       max_iters=100)
        for step in (1, 2):
            runner.step = step
            hook.after_train_iter(runner)
        kept = sorted(d for d in os.listdir(wd) if d.startswith("iter_"))
        assert kept == ["iter_2", "iter_50"]

    def test_default_keeps_all(self, tmp_path):
        from rscotr_tpu.engine import CheckpointHook
        wd = str(tmp_path / "wd")
        params = {"w": np.zeros(3, np.float32)}
        hook = CheckpointHook(interval=1, work_dir=wd)
        runner = types.SimpleNamespace(params=params, opt_state=None,
                                       max_iters=100)
        for step in (1, 2, 3):
            runner.step = step
            hook.after_train_iter(runner)
        kept = sorted(d for d in os.listdir(wd) if d.startswith("iter_"))
        assert kept == ["iter_1", "iter_2", "iter_3"]
