"""EpochBasedRunner config support (reference single-task 50e/200e configs).

The reference builds mmcv runners straight from ``cfg.runner``
(/root/reference/mtl/apis/train.py:54-61); its det config runs
``EpochBasedRunner`` 50 epochs with by-epoch LR steps/checkpoint/eval
intervals. ``apis.resolve_schedule`` converts all epoch-denominated knobs
to iterations from the loader length at build time so those configs run
unmodified on the iter-based TPU hot loop.
"""

import os

import numpy as np
import pytest

from rscotr_tpu.apis import resolve_schedule
from rscotr_tpu.config import Config

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _Cfg(dict):
    def get(self, k, d=None):
        return dict.get(self, k, d)


class TestResolveSchedule:
    def test_iter_based_passthrough(self):
        cfg = _Cfg(runner={"type": "IterBasedRunner", "max_iters": 123},
                   lr_config={"policy": "step", "step": [100]},
                   checkpoint_config={"interval": 50},
                   evaluation={"interval": 25})
        s = resolve_schedule(cfg, epoch_len=10)
        assert not s["epoch_based"]
        assert s["max_iters"] == 123
        assert s["lr_config"]["step"] == [100]
        assert s["checkpoint_config"]["interval"] == 50
        assert s["evaluation"]["interval"] == 25

    def test_epoch_based_scales_everything(self):
        """Reference det 50e config shape: step=[45] epochs, ckpt interval
        5 epochs, eval interval 1 epoch."""
        cfg = _Cfg(runner={"type": "EpochBasedRunner", "max_epochs": 50},
                   lr_config={"policy": "step", "step": [45]},
                   checkpoint_config={"interval": 5},
                   evaluation={"interval": 1})
        s = resolve_schedule(cfg, epoch_len=100)
        assert s["epoch_based"]
        assert s["max_iters"] == 5000
        assert s["lr_config"]["step"] == [4500]
        assert s["lr_config"]["max_iters"] == 5000
        assert s["checkpoint_config"]["interval"] == 500
        assert s["evaluation"]["interval"] == 100

    def test_by_epoch_false_keeps_iters(self):
        """mmcv by_epoch=False: intervals already in iters."""
        cfg = _Cfg(runner={"type": "EpochBasedRunner", "max_epochs": 2},
                   lr_config={"policy": "poly", "max_iters": 80000},
                   checkpoint_config={"by_epoch": False, "interval": 20000},
                   evaluation={"by_epoch": False, "interval": 8000})
        s = resolve_schedule(cfg, epoch_len=10)
        assert s["max_iters"] == 20
        assert s["checkpoint_config"]["interval"] == 20000
        assert s["evaluation"]["interval"] == 8000
        assert s["lr_config"]["max_iters"] == 80000

    def test_override_wins(self):
        cfg = _Cfg(runner={"type": "EpochBasedRunner", "max_epochs": 50})
        s = resolve_schedule(cfg, epoch_len=100, max_iters_override=7)
        assert s["max_iters"] == 7


class TestEpochConfigsCompose:
    @pytest.mark.parametrize("rel,epochs", [
        ("configs/det/dino_4scale_r50_1x1_50e_dior.py", 50),
        ("configs/det/dino_4scale_swin-t-p4-w7_1x1_50e_dior.py", 50),
        ("configs/cls/swin-tiny_1xb16_resisc.py", 200),
    ])
    def test_reference_epoch_configs_load(self, rel, epochs):
        cfg = Config.fromfile(os.path.join(ROOT, rel))
        assert cfg["runner"]["type"] == "EpochBasedRunner"
        assert cfg["runner"]["max_epochs"] == epochs
        s = resolve_schedule(cfg, epoch_len=1000)
        assert s["max_iters"] == epochs * 1000


@pytest.mark.slow
class TestEpochSmoke:
    def test_one_epoch_train(self, tmp_path):
        """One real epoch through train_model on a shrunken synthetic MTL
        config: max_iters derives from the loader lengths."""
        from rscotr_tpu.apis import train_model
        from rscotr_tpu.data import load_data_cfg
        cfg = Config.fromfile(os.path.join(
            ROOT, "configs/multi/MTL_tiny_synthetic.py"))
        cfg.merge_from_dict({
            "runner": {"type": "EpochBasedRunner", "max_epochs": 1},
            "data.resisc.data.train.length": 4,
            "data.dior.data.train.length": 1,
            "data.potsdam.data.train.length": 2,
            "checkpoint_config.interval": 1,
            "log_config.interval": 1,
        })
        cfg = load_data_cfg(cfg, config_root=ROOT)
        runner = train_model(cfg, str(tmp_path / "wd"), validate=False,
                             num_devices=1)
        # 4//4 cls + 1//1 det + 2//2 seg batches = 3 iters/epoch
        assert runner.max_iters == 3
        assert runner.step == 3
