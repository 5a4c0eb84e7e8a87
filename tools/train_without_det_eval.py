#!/usr/bin/env python
"""Train CLI that skips the (slow) detection eval during training.

Public-surface equivalent of /root/reference/tools/train_without_det_eval.py
(sole diff at :25: imports train_model_without_det_eval; README.md:102).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import tools.train as train_cli  # noqa: E402
from rscotr_tpu import apis  # noqa: E402

# swap in the det-eval-skipping variant, then reuse the full CLI
_orig = apis.train_model


def _train_model(cfg, work_dir, **kwargs):
    kwargs["skip_det_eval"] = True
    return _orig(cfg, work_dir, **kwargs)


apis.train_model = _train_model

if __name__ == "__main__":
    train_cli.main()
