"""Multi-host (multi-process) gather helpers.

The reference's distributed eval gathers ragged per-image results across
ranks via a shared tmpdir or CPU tensor broadcast
(mm* ``collect_results_cpu/gpu``, reached from
/root/reference/mtl/engine/test.py:41-53). The TPU-native equivalent rides
the ICI/DCN collectives JAX already exposes: arbitrary python results are
pickled to uint8 arrays, padded to the max length, and exchanged with
``multihost_utils.process_allgather`` — no shared filesystem needed.

Single-process (the common case on one host) short-circuits without
touching collectives, so these helpers are safe to call unconditionally.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np

import jax


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def all_gather_pyobjects(obj: Any) -> List[Any]:
    """Gather one arbitrary picklable object from every process.

    Returns the list [obj_from_process_0, ..., obj_from_process_{P-1}]
    on every process. P == 1 returns [obj] without any collective.
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    n = np.asarray([payload.size], dtype=np.int64)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    max_len = int(sizes.max())
    padded = np.zeros((max_len,), dtype=np.uint8)
    padded[:payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(jax.process_count(), max_len)
    return [pickle.loads(gathered[i, :int(sizes[i])].tobytes())
            for i in range(jax.process_count())]


def merge_strided_results(per_process: List[dict]) -> dict:
    """Merge per-process {dataset: [(global_idx, result), ...]} shards into
    {dataset: [result, ...]} ordered by global index."""
    merged: dict = {}
    for shard in per_process:
        for name, items in shard.items():
            merged.setdefault(name, []).extend(items)
    return {name: [r for _, r in sorted(items, key=lambda x: x[0])]
            for name, items in merged.items()}
