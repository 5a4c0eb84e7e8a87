"""Shared synthetic-batch construction for the perf tools.

tools/benchmark.py and tools/trace_step.py must build IDENTICAL batches —
shapes derived from the config's per-task loader entries (det_bucket_hw,
seg_size, cls_size, samples_per_gpu, max_gt) — or op-level traces stop
corresponding to the graphs being benchmarked. Keep the derivation and the
batch makers here, in one place.
"""

from __future__ import annotations

import numpy as np


def derive_shapes(cfg, overrides=None):
    """Per-task batch shapes from the config's loader entries; `overrides`
    is an optional {task: {"bs"/"size": int}} (CLI flags win)."""
    shapes = {"cls": dict(bs=16, size=224),
              "det": dict(bs=1, size=800, max_gt=100),
              "seg": dict(bs=2, size=512)}
    for entry in cfg.data.values():
        t = entry.get("task")
        if t not in shapes:
            continue
        opts = dict(entry.get("loader", {}) or {})
        shapes[t]["bs"] = int(entry.get("data", {}).get(
            "samples_per_gpu", shapes[t]["bs"]))
        if t == "cls" and "cls_size" in opts:
            shapes[t]["size"] = int(opts["cls_size"])
        if t == "det":
            if "det_bucket_hw" in opts:
                shapes[t]["size"] = int(opts["det_bucket_hw"][0])
            shapes[t]["max_gt"] = int(opts.get("max_gt", 100))
        if t == "seg" and "seg_size" in opts:
            shapes[t]["size"] = int(opts["seg_size"])
    for t, ov in (overrides or {}).items():
        for k, v in ov.items():
            if v:
                shapes[t][k] = v
    return shapes


def make_batch_fns(shapes, rng: np.random.Generator, num_classes=None):
    """{task: fn(i) -> batch dict of jnp arrays} at the derived shapes.
    ``num_classes``: optional {"cls"/"det"/"seg": int} label ranges."""
    import jax.numpy as jnp
    nc = {"cls": 2, "det": 2, "seg": 3}
    nc.update(num_classes or {})

    def cls_batch(i):
        bs, S = shapes["cls"]["bs"], shapes["cls"]["size"]
        return {"img": jnp.asarray(
                    rng.normal(size=(bs, S, S, 3)).astype(np.float32)),
                "gt_label": jnp.asarray(
                    rng.integers(0, nc["cls"], size=(bs,)).astype(np.int32))}

    def det_batch(i):
        bs, S, G = (shapes["det"]["bs"], shapes["det"]["size"],
                    shapes["det"]["max_gt"])
        cx = rng.uniform(0.2, 0.8, size=(bs, G))
        cy = rng.uniform(0.2, 0.8, size=(bs, G))
        wh = rng.uniform(0.05, 0.2, size=(bs, G, 2))
        boxes = np.stack([(cx - wh[..., 0] / 2) * S,
                          (cy - wh[..., 1] / 2) * S,
                          (cx + wh[..., 0] / 2) * S,
                          (cy + wh[..., 1] / 2) * S], -1).astype(np.float32)
        return {"img": jnp.asarray(rng.normal(
                    size=(bs, S, S, 3)).astype(np.float32)),
                "img_hw": jnp.asarray([[S, S]] * bs, jnp.int32),
                "scale_factor": jnp.ones((bs, 4), jnp.float32),
                "gt_bboxes": jnp.asarray(boxes),
                "gt_labels": jnp.asarray(rng.integers(
                    0, nc["det"], size=(bs, G)).astype(np.int32)),
                "gt_valid": jnp.asarray(
                    np.arange(G)[None] < min(10, G)).repeat(bs, 0)}

    def seg_batch(i):
        bs, S = shapes["seg"]["bs"], shapes["seg"]["size"]
        return {"img": jnp.asarray(rng.normal(
                    size=(bs, S, S, 3)).astype(np.float32)),
                "img_hw": jnp.asarray([[S, S]] * bs, jnp.int32),
                "gt_semantic_seg": jnp.asarray(rng.integers(
                    0, nc["seg"], size=(bs, S, S)).astype(np.int32))}

    return {"cls": cls_batch, "det": det_batch, "seg": seg_batch}
