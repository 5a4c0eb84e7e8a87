"""Device mesh + sharding utilities.

Replaces the reference's NCCL/DDP layer (SURVEY.md §2b, §5.8):
``torch.distributed`` all-reduce / DDP gradient sync become XLA collectives
inserted by the compiler under ``jax.sharding``: params REPLICATED over a
1-D ``data`` mesh, batches sharded on the leading axis, gradient psum
implicit in the jitted step. Multi-host init is
``jax.distributed.initialize`` (no launcher plumbing needed).

The mesh is deliberately N-D-ready: ``make_mesh(axes={'data': -1})`` today;
model axes can be added without touching call sites (Swin-T at 28M params
needs no TP/PP — SURVEY.md §2b parallelism table).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_params(params, mesh: Mesh):
    """Replicate the param pytree across the mesh."""
    s = replicated(mesh)
    return jax.device_put(params, s)


def replicate_global(tree, mesh: Mesh):
    """Replicate a host-local pytree over a (possibly multi-host) mesh.

    Single-process: plain ``device_put`` to a replicated sharding.
    Multi-process: every host holds the same values (same-seed init /
    checkpoint), so ``host_local_array_to_global_array`` assembles the
    fully-replicated global arrays (device_put cannot address other
    hosts' devices)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return multihost_utils.host_local_array_to_global_array(
            tree, mesh, P())
    return jax.device_put(tree, replicated(mesh))


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh,
                axis_name: str = "data"):
    """Shard every array on the leading (batch) axis."""
    s = batch_sharded(mesh, axis_name)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def pad_batch_to_devices(batch: Dict[str, np.ndarray],
                         n_devices: int) -> Tuple[Dict[str, np.ndarray], int]:
    """Pad leading axis to a multiple of n_devices (eval-time)."""
    n = len(next(iter(batch.values())))
    target = ((n + n_devices - 1) // n_devices) * n_devices
    if target == n:
        return batch, n
    out = {}
    for k, v in batch.items():
        pad = [(0, target - n)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, pad)
    return out, n


def initialize_distributed(launcher: str = "none",
                           coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (replaces init_dist, tools/train.py:174-182).

    ``launcher='none'`` is a no-op. Otherwise resolve process topology from
    args or the environment (JAX/TPU pod env vars are auto-detected by
    ``jax.distributed.initialize()``; torchrun-style WORLD_SIZE/RANK/
    MASTER_ADDR are mapped for the 'pytorch' launcher).
    """
    import os

    if launcher == "none":
        return
    env = os.environ
    if num_processes is None:
        num_processes = int(env.get("WORLD_SIZE",
                                    env.get("JAX_NUM_PROCESSES", "0")) or 0)
    if process_id is None and "RANK" in env:
        process_id = int(env["RANK"])
    if coordinator is None and "MASTER_ADDR" in env:
        coordinator = (f"{env['MASTER_ADDR']}:"
                       f"{env.get('MASTER_PORT', '8476')}")
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif launcher == "jax":
        # TPU pod slice: topology comes from the runtime environment.
        jax.distributed.initialize()
