"""Ahead-of-time export of the per-task inference functions (serving).

Capability analog of the reference's deployment surface: the vendored
DETRHead carries ONNX export paths
(/root/reference/models/multi/bbox_head/mmdet_detr_head/detr_head.py:706-843).
The TPU-native equivalent is ``jax.export`` — each task's jitted inference
step is lowered to StableHLO ahead of time, serialized together with its
calling convention, and reloadable WITHOUT any model code: the artifact
directory (per-task ``.stablehlo`` blobs + ``params.npz`` + ``meta.json``)
is sufficient to serve.

Calling convention: every exported function takes the FLAT list of
parameter leaves (tree order) followed by the task inputs, so serving-side
loading is ``np.load`` + ``jax.export.deserialize`` — no flax, no configs,
no pytree reconstruction. Exports can target multiple platforms at once
(``platforms=("cpu", "tpu")``): the same artifact is checkable on a CPU
host and servable on TPU.

Outputs mirror the test engine's contracts (engine/test.py):
  cls: (B, num_classes) softmax probabilities
  det: ((B, max_per_img, 5) xyxy+score, (B, max_per_img) labels)
  seg: (B, H, W) int label map
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from rscotr_tpu.engine.train_step import make_infer_steps

META_NAME = "meta.json"
PARAMS_NAME = "params.npz"

_TASK_INPUT_NAMES = {
    "cls": ("img",),
    "det": ("img", "img_hw", "scale_factor"),
    "seg": ("img",),
}


def task_input_specs(task: str, bs: int, size: int,
                     img_dtype=jnp.float32):
    """ShapeDtypeStructs for one task's inference inputs (static shapes —
    the serving contract is one compiled program per (bs, size) bucket,
    matching the training-time static-shape discipline).

    ``img_dtype=jnp.uint8`` exports a raw-bytes-in artifact: the inference
    steps normalize uint8 inputs ON DEVICE (engine/train_step.py::
    device_normalize), so the mean/std get baked into the program —
    serving then feeds resized raw pixels with no host preprocessing."""
    img = jax.ShapeDtypeStruct((bs, size, size, 3), img_dtype)
    if task == "det":
        return (img, jax.ShapeDtypeStruct((bs, 2), jnp.int32),
                jax.ShapeDtypeStruct((bs, 4), jnp.float32))
    return (img,)


def export_inference(model, params, shapes: Dict[str, dict], *,
                     tasks: Sequence[str] = ("cls", "det", "seg"),
                     max_per_img: int = 300, img_norm=None,
                     seg_test_cfg=None,
                     platforms: Optional[Sequence[str]] = None,
                     img_dtype=jnp.float32
                     ) -> Dict[str, "jax.export.Exported"]:
    """Lower + export each task's inference step.

    ``shapes``: {task: {"bs": int, "size": int}} (the per-task serving
    buckets). Returns {task: jax.export.Exported}; pair with
    :func:`save_artifact` to persist.
    """
    from jax import export as jexport

    infer = make_infer_steps(model, max_per_img=max_per_img,
                             img_norm=img_norm, seg_test_cfg=seg_test_cfg)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaf_specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]

    out: Dict[str, jexport.Exported] = {}
    for task in tasks:
        step = infer[task]

        def serve(flat, *inputs, _step=step):
            return _step(jax.tree_util.tree_unflatten(treedef, flat),
                         *inputs)

        specs = task_input_specs(task, int(shapes[task]["bs"]),
                                 int(shapes[task]["size"]),
                                 img_dtype=img_dtype)
        exp = jexport.export(jax.jit(serve),
                             platforms=(list(platforms)
                                        if platforms else None))
        out[task] = exp(list(leaf_specs), *specs)
    return out


def _leaf_key(i: int, path) -> str:
    return f"{i:05d}|" + jax.tree_util.keystr(path, simple=True,
                                              separator="/")


def save_artifact(out_dir: str, exported: Dict, params,
                  shapes: Dict[str, dict], *, classes=None,
                  img_norm=None,
                  extra_meta: Optional[dict] = None) -> None:
    """Persist exports + flat params + metadata into ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)
    paths = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {_leaf_key(i, p): np.asarray(v)
              for i, (p, v) in enumerate(paths)}
    np.savez(os.path.join(out_dir, PARAMS_NAME), **arrays)

    meta = {
        "jax_version": jax.__version__,
        "num_param_leaves": len(arrays),
        "tasks": {},
        "classes": classes or {},
        # (mean, std): baked into the program for uint8-input artifacts;
        # for float32-input artifacts the caller must pre-normalize with
        # these stats (None = not normalized in-graph / ImageNet default)
        "img_norm": ([list(img_norm[0]), list(img_norm[1])]
                     if img_norm is not None else None),
    }
    for task, exp in exported.items():
        with open(os.path.join(out_dir, f"{task}.stablehlo"), "wb") as f:
            f.write(exp.serialize())
        meta["tasks"][task] = {
            "platforms": list(exp.platforms),
            "input_names": list(_TASK_INPUT_NAMES[task]),
            "input_specs": [[list(a.shape), str(a.dtype)]
                            for a in exp.in_avals[len(arrays):]],
            "output_specs": [[list(a.shape), str(a.dtype)]
                             for a in exp.out_avals],
            "bs": int(shapes[task]["bs"]),
            "size": int(shapes[task]["size"]),
        }
    meta.update(extra_meta or {})
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f, indent=2)


def load_artifact(out_dir: str, tasks: Optional[Sequence[str]] = None
                  ) -> Tuple[Dict[str, callable], dict]:
    """Load a served model WITHOUT any model code: returns
    ({task: fn(*inputs) -> outputs}, meta). Params are loaded once and
    closed over; each fn dispatches the deserialized StableHLO program on
    the current default backend."""
    from jax import export as jexport

    with open(os.path.join(out_dir, META_NAME)) as f:
        meta = json.load(f)
    with np.load(os.path.join(out_dir, PARAMS_NAME)) as z:
        flat = [jnp.asarray(z[k]) for k in sorted(z.files)]
    assert len(flat) == meta["num_param_leaves"], "params.npz leaf mismatch"

    fns: Dict[str, callable] = {}
    for task in (tasks or meta["tasks"].keys()):
        with open(os.path.join(out_dir, f"{task}.stablehlo"), "rb") as f:
            exp = jexport.deserialize(f.read())

        def run(*inputs, _exp=exp):
            return _exp.call(flat, *inputs)

        fns[task] = run
    return fns, meta
