"""ZeRO/FSDP-style parameter + optimizer-state sharding over ``data``.

The reference replicates the full model + Adam moments on every GPU (DDP,
/root/reference/mtl/apis/train.py:37-48) — fine at Swin-T scale, but the
per-device memory is (params + 2 moments) regardless of world size. The
TPU-native alternative is the scaling-book FSDP recipe: shard every large
param leaf (and its mirrored ``mu``/``nu`` moments) over the existing
``data`` mesh axis and let GSPMD insert the collectives — weights are
all-gathered on ICI right before use and gradients arrive reduce-scattered,
so per-device state memory drops ~linearly with the axis size while the
math stays bit-identical to DP (same global batch, same update).

No module or step-function changes: like ``parallel/tp.py`` this only
annotates the *placement* of params/opt-state; the jitted train step picks
the shardings up from its committed inputs. Leaves too small to matter
(or with no dimension divisible by the axis size) stay replicated —
correctness never depends on divisibility.

Composes with TP: on a 2-D mesh, apply ``tp_param_specs`` first and pass
the result as ``base_specs``; FSDP then shards a *different* dim of each
leaf over ``data`` where possible (a dim already sharded over ``model`` is
left alone).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Below this many elements a leaf stays replicated: an all-gather dispatch
# costs more than holding 8 copies of a LayerNorm bias.
DEFAULT_MIN_LEAF_SIZE = 2 ** 14


import re

# Swin window-attention kernels need a FIXED shard dim — the default
# largest-dim heuristic makes GSPMD fall back to involuntary full
# rematerialization of the window-attn brick (spmd_partitioner warnings
# in the cold-compiled FSDP det leg; measured 6 -> 0 by this table,
# loss bit-identical):
# * ``attn/qkv/kernel`` (C, 3C) shards dim 0 (input): its 3C output
#   features are laid out (3, H, hd) with the 3 MAJOR, so an output-dim
#   split crosses the q/k/v boundary and the (B_, n, 3, H, hd) reshape
#   is unpartitionable — the layout hazard tp.py documents for column
#   sharding.
# * ``attn/proj/kernel`` (C, C) shards dim 1 (output): its INPUT dim
#   contracts against the attention output (features = H·hd), and
#   sharding a contraction dim makes the partitioner propagate a
#   head-dim sharding BACKWARD through the whole softmax/weighted-sum
#   brick, colliding with the batch sharding.
# Either way the leaf's at-rest memory is 1/axis_size and GSPMD
# all-gathers the kernel right before use; the activation partition
# stays pure batch-sharded.
_FIXED_DIM_PATHS: Tuple[Tuple[re.Pattern, int], ...] = (
    (re.compile(r"/attn/qkv/kernel$"), 0),
    (re.compile(r"/attn/proj/kernel$"), 1),
)


def _fsdp_spec(shape: Tuple[int, ...], axis_size: int, axis_name: str,
               base: P, min_size: int,
               fixed_dim: Optional[int] = None) -> P:
    """Shard the largest not-yet-sharded, divisible dim over ``axis_name``
    (``fixed_dim``: only consider this dim — see _FIXED_DIM_PATHS)."""
    if not shape or int(np.prod(shape)) < min_size:
        return base
    taken = set(base) if base else set()
    if axis_name in taken:
        return base
    dims = sorted(range(len(shape)), key=lambda d: -shape[d])
    if fixed_dim is not None:
        dims = [fixed_dim] if fixed_dim < len(shape) else []
    for d in dims:
        already = base[d] if base and d < len(base) else None
        if already is not None:
            continue
        if shape[d] % axis_size == 0 and shape[d] >= axis_size:
            entries = list(base) if base else [None] * len(shape)
            entries += [None] * (len(shape) - len(entries))
            entries[d] = axis_name
            while entries and entries[-1] is None:
                entries.pop()
            return P(*entries)
    return base


def fsdp_param_specs(params: Any, mesh: Mesh, axis_name: str = "data",
                     min_leaf_size: int = DEFAULT_MIN_LEAF_SIZE,
                     base_specs: Optional[Any] = None) -> Any:
    """Per-leaf ``NamedSharding`` tree sharding large leaves over ``data``.

    ``base_specs`` (a matching tree of ``NamedSharding``, e.g. from
    ``tp_param_specs``) seeds each leaf's spec; FSDP adds the ``data`` axis
    on top where a free divisible dim exists."""
    axis_size = mesh.shape.get(axis_name, 1)
    flat_kp = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree.structure(params)
    if base_specs is None:
        base_flat = [P()] * len(flat_kp)
    else:
        base_flat = [s.spec for s in jax.tree.leaves(
            base_specs, is_leaf=lambda x: isinstance(x, NamedSharding))]
    shardings = []
    for (keypath, leaf), base in zip(flat_kp, base_flat):
        path = "/" + "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        fixed = next((d for pat, d in _FIXED_DIM_PATHS
                      if pat.search(path)), None)
        spec = _fsdp_spec(tuple(getattr(leaf, "shape", ())), axis_size,
                          axis_name, base, min_leaf_size, fixed_dim=fixed)
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree.unflatten(treedef, shardings)


def _put_global(tree, shardings) -> Any:
    """Place a host-full pytree under per-leaf ``NamedSharding``.

    Single-process: plain ``device_put``. Multi-process: every host holds
    the same FULL values (same-seed init / checkpoint), so each process
    feeds its addressable shards by slicing its own copy
    (``make_array_from_callback`` — ``device_put`` cannot address other
    hosts' devices, and ``host_local_array_to_global_array`` would wrongly
    treat the full copy as this host's shard and inflate the global
    shape)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)
    if isinstance(shardings, NamedSharding):
        shardings = jax.tree.map(lambda _: shardings, tree)

    def _make(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    return jax.tree.map(_make, tree, shardings)


def shard_params_fsdp(params: Any, mesh: Mesh, **kw) -> Any:
    """Place a param pytree with FSDP specs over ``mesh``."""
    return _put_global(params, fsdp_param_specs(params, mesh, **kw))


def shard_opt_state_fsdp(opt_state: Any, param_specs: Any,
                         mesh: Mesh) -> Any:
    """Adam moments (and the grad-accumulation buffer, when
    ``cumulative_iters>1``) mirror their params' shapes -> same specs;
    per-leaf step counters / accum touched-masks are scalars ->
    replicated."""
    repl = NamedSharding(mesh, P())
    out = dict(opt_state)
    for key in ("mu", "nu", "accum"):
        if key in out:
            out[key] = _put_global(out[key], param_specs)
    for key in ("count", "step", "accum_mask"):
        if key in out:
            out[key] = _put_global(out[key], repl)
    return out


def describe_fsdp(params: Any, mesh: Mesh, **kw) -> str:
    """Human-readable summary: sharded fraction + per-device param bytes."""
    specs = fsdp_param_specs(params, mesh, **kw)
    axis = kw.get("axis_name", "data")
    n = mesh.shape.get(axis, 1)
    n_sharded = n_total = 0
    b_total = b_local = 0
    for leaf, sh in zip(jax.tree.leaves(params), jax.tree.leaves(
            specs, is_leaf=lambda x: isinstance(x, NamedSharding))):
        size = getattr(leaf, "nbytes", 0)
        n_total += 1
        b_total += size
        if axis in (sh.spec or ()):
            n_sharded += 1
            b_local += size // n
        else:
            b_local += size
    return (f"FSDP over mesh {dict(mesh.shape)}: {n_sharded}/{n_total} "
            f"param leaves sharded; {b_local / 1e6:.1f} MB/device vs "
            f"{b_total / 1e6:.1f} MB replicated")
