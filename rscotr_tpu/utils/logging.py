"""Logging + metric sinks.

Reference capability: mmcv get_root_logger (file+stream), TextLoggerHook and
TensorboardLoggerHook with loss keys namespaced ``{task}.{dataset}.{metric}``
(reference multitask_learner.py:233-235, configs/multi/default_runtime.py:14-19).

TPU build: std logging for text; metrics go to a JSONL sink always and to
TensorBoard when a writer is importable (gated — no hard dependency).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional

_LOGGERS: Dict[str, logging.Logger] = {}


def get_root_logger(log_file: Optional[str] = None,
                    log_level: int = logging.INFO,
                    name: str = "rscotr_tpu") -> logging.Logger:
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(log_level)
    logger.propagate = False
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file, "a")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _LOGGERS[name] = logger
    return logger


class MetricsSink:
    """Writes scalar metrics to JSONL (always) and TensorBoard (if present)."""

    def __init__(self, log_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, filename)
        self._file = open(self._path, "a")
        self._tb = None
        try:  # gated: tensorboard writer is optional in this image
            from torch.utils.tensorboard import SummaryWriter  # noqa
            self._tb = SummaryWriter(log_dir=os.path.join(log_dir, "tb"))
        except Exception:
            self._tb = None

    def log_scalars(self, step: int, scalars: Dict[str, Any],
                    prefix: str = "") -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            key = f"{prefix}{k}" if prefix else k
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                rec[key] = v
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k in ("step", "time") or not isinstance(v, float):
                    continue
                self._tb.add_scalar(k, v, global_step=step)

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()


def collect_env() -> Dict[str, str]:
    import platform

    info = {
        "python": sys.version.replace("\n", " "),
        "platform": platform.platform(),
    }
    try:
        import jax
        info["jax"] = jax.__version__
        info["jax_backend"] = jax.default_backend()
        info["devices"] = ", ".join(str(d) for d in jax.devices())
    except Exception as e:  # pragma: no cover
        info["jax"] = f"unavailable ({e})"
    try:
        import flax
        info["flax"] = flax.__version__
    except Exception:
        pass
    return info
