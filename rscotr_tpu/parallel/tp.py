"""Tensor-parallel param sharding over a 2-D (data, model) mesh.

The reference scales only by DDP (NCCL data parallelism,
/root/reference/mtl/apis/train.py:37-48). The TPU rebuild goes further: a
2-D ``Mesh(('data', 'model'))`` where the batch shards over ``data`` and the
transformer weight matrices shard Megatron-style over ``model``:

* FFN up projection (C -> 4C) column-sharded ``P(None, 'model')`` (+ bias
  ``P('model')``); FFN down projection (4C -> C) row-sharded
  ``P('model', None)`` — one implicit reduce per FFN, inserted by GSPMD.
* attention input projections (q/k/v and the MSDA value_proj) column-sharded
  so heads split across ``model``; output projections row-sharded.
* everything else (norms, embeddings, conv backbone, task heads' small
  branches) replicated.

No module code changes: specs are assigned per param *path* and handed to
``jax.device_put``; the jitted train step picks the shardings up from its
committed inputs and GSPMD inserts the collectives (scaling-book recipe:
annotate inputs, let the compiler place all-gather/reduce-scatter on ICI).
Optimizer moments (``mu``/``nu`` mirror param shapes) shard identically.

Sharding a dim that is not divisible by the ``model`` axis size falls back
to replicated for that leaf — correctness never depends on divisibility.

STATUS (measured 2026-08-21, VERDICT r4 #5 — PERF.md "TP vs DP measured
once"): at this model scale TP is RETIRED as a production topology —
dp×tp=4×2 measured 30% slower than dp=8 at equal device count
(10.83 → 7.62 img/s on the 8-device mesh; every per-task step 44-69%
slower than the dp=4 control at the same data world). A 28 M-param
backbone needs neither TP's memory relief (FSDP is free at step time)
nor its FLOP split (DP provides it whenever batch >= chips). This module
remains the mechanism — and the fused-qkv layout rules below the map —
for backbones that genuinely pressure HBM.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(n_data: int, n_model: int,
                 devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    assert len(devs) >= n_data * n_model, (len(devs), n_data, n_model)
    arr = np.array(devs[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


# (path regex, kernel spec, bias spec) — first match wins. Paths are the
# '/'-joined flax param path, e.g.
# 'shared_encoder/layers_0/ffn/fc0/kernel'.
_COL = object()   # shard output features: kernel P(None, 'model'), bias P('model')
_ROW = object()   # shard input features:  kernel P('model', None), bias P()

_RULES: Tuple[Tuple[str, object], ...] = (
    # transformer FFN bricks (shared encoder, DINO decoder, Mask2Former)
    (r"/ffn/fc0/", _COL),
    (r"/ffn/fc1/", _ROW),
    # multi-head attention projections
    (r"/(q_proj|k_proj|v_proj|value_proj)/", _COL),
    (r"/(out_proj|output_proj)/", _ROW),
    # Swin window attention is REPLICATED (no rule): its fused qkv Dense
    # emits 3C features laid out (3, H, hd) with the 3 MAJOR — a flat
    # column sharding over 'model' crosses the q/k/v boundary, so the
    # (B_, n, 3, H, hd) reshape is not partitionable and GSPMD fell back
    # to involuntary full rematerialization of the whole window-attn
    # brick (MULTICHIP_r03 spmd_partitioner warnings; VERDICT r3 #3).
    # Replicating these two (small: 3C^2 + C^2 per block) keeps the FFNs
    # sharded and the partition clean; head-aligned qkv sharding would
    # need a 3-way split of the projection (checkpoint-layout change) for
    # a marginal win on a 28M-param backbone.
    # Swin MLP (flat names mlp_fc1/mlp_fc2 in backbones/swin.py)
    (r"/mlp_fc1/", _COL),
    (r"/mlp_fc2/", _ROW),
)


def _spec_for(path: str, shape: Tuple[int, ...], n_model: int):
    is_kernel = path.endswith("/kernel")
    is_bias = path.endswith("/bias")
    if not (is_kernel or is_bias):
        return P()
    for pat, kind in _RULES:
        if re.search(pat, path):
            if kind is _COL:
                if is_kernel and len(shape) == 2 and \
                        shape[1] % n_model == 0:
                    return P(None, "model")
                if is_bias and shape[0] % n_model == 0:
                    return P("model")
            else:  # _ROW
                if is_kernel and len(shape) == 2 and \
                        shape[0] % n_model == 0:
                    return P("model", None)
            return P()
    return P()


def tp_param_specs(params: Any, mesh: Mesh) -> Any:
    """Per-leaf ``NamedSharding`` tree for a param (or moment) pytree."""
    n_model = mesh.shape.get("model", 1)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree.structure(params)
    shardings = []
    for keypath, leaf in flat:
        path = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        spec = _spec_for("/" + path, getattr(leaf, "shape", ()), n_model)
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree.unflatten(treedef, shardings)


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree with Megatron-style TP specs over ``mesh``."""
    return jax.device_put(params, tp_param_specs(params, mesh))


def shard_opt_state_tp(opt_state: Any, params_specs: Any, mesh: Mesh) -> Any:
    """Moments shard like their params; counters replicate."""
    repl = NamedSharding(mesh, P())
    out = dict(opt_state)
    for key in ("mu", "nu"):
        if key in out:
            out[key] = jax.device_put(out[key], params_specs)
    for key in ("count", "step"):
        if key in out:
            out[key] = jax.device_put(out[key], repl)
    return out


def describe_tp(params: Any, mesh: Mesh) -> str:
    """Human-readable summary: how many leaves / bytes shard over 'model'."""
    specs = tp_param_specs(params, mesh)
    n_sharded = n_total = 0
    b_sharded = b_total = 0
    for leaf, sh in zip(jax.tree.leaves(params), jax.tree.leaves(
            specs, is_leaf=lambda x: isinstance(x, NamedSharding))):
        size = getattr(leaf, "nbytes", 0)
        n_total += 1
        b_total += size
        if any(sh.spec):
            n_sharded += 1
            b_sharded += size
    return (f"TP over mesh {dict(mesh.shape)}: {n_sharded}/{n_total} "
            f"param leaves sharded ({b_sharded / 1e6:.1f}/"
            f"{b_total / 1e6:.1f} MB)")
