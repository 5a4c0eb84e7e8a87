"""RNG plumbing: one root seed -> named jax PRNG streams + numpy generators.

Reference capability: --seed/--diff-seed/--deterministic (tools/train.py:209-217).
In JAX determinism is the default; `fold_in` per step/host gives the
--diff-seed behavior without desyncing the task schedule (task choice is a
host-side function of the global step, identical on all hosts).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np


class RngPool:
    """Named, step-foldable PRNG streams derived from one root seed."""

    def __init__(self, seed: int):
        self.seed = int(seed)
        self._root = jax.random.key(self.seed)
        self.numpy = np.random.Generator(np.random.PCG64(self.seed))

    def make(self, name: str, step: Optional[int] = None) -> jax.Array:
        k = jax.random.fold_in(self._root, _stable_hash(name))
        if step is not None:
            k = jax.random.fold_in(k, step)
        return k

    def make_dict(self, names, step: Optional[int] = None) -> Dict[str, jax.Array]:
        return {n: self.make(n, step) for n in names}


def _stable_hash(name: str) -> int:
    h = 2166136261
    for ch in name.encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return h


def set_random_seed(seed: int) -> RngPool:
    np.random.seed(seed)
    return RngPool(seed)
