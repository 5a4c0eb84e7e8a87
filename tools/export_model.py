"""Export a trained model's inference functions as serving artifacts.

TPU-native analog of the reference's ONNX deploy surface
(/root/reference/models/multi/bbox_head/mmdet_detr_head/detr_head.py:706-843):
lowers each task's jitted inference step to StableHLO via ``jax.export``
and writes a self-contained artifact directory —
``{task}.stablehlo`` + ``params.npz`` + ``meta.json`` — loadable for
serving WITHOUT model code (see rscotr_tpu/export.py::load_artifact).

Usage:
  python tools/export_model.py CONFIG CHECKPOINT --out DIR \
      [--tasks cls det seg] [--platforms cpu tpu] [--check]

``--check`` reloads the artifact and verifies each task's outputs match
the live model on random inputs (run with JAX_PLATFORMS=cpu for a
hermetic check).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rscotr_tpu.utils import (honor_jax_platforms_env,  # noqa: E402
                              setup_compile_cache)

honor_jax_platforms_env()
setup_compile_cache()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rscotr_tpu.config import Config  # noqa: E402
from rscotr_tpu.data import load_data_cfg  # noqa: E402


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--tasks", nargs="+", default=["cls", "det", "seg"],
                   choices=["cls", "det", "seg"])
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering platforms (e.g. cpu tpu); default: "
                        "current backend only")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and verify outputs against "
                        "the live model")
    p.add_argument("--input-dtype", default="float32",
                   choices=["float32", "uint8"],
                   help="uint8 = raw-bytes-in serving artifact "
                        "(normalization baked into the program)")
    for t in ("cls", "det", "seg"):
        p.add_argument(f"--{t}-bs", type=int, default=0)
        p.add_argument(f"--{t}-size", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(args.config)
    cfg = load_data_cfg(cfg, config_root=root)

    from _bench_common import derive_shapes
    from rscotr_tpu.apis import derive_img_norm
    from rscotr_tpu.engine import load_checkpoint, make_infer_steps
    from rscotr_tpu.export import (export_inference, load_artifact,
                                   save_artifact, task_input_specs)
    from rscotr_tpu.models import build_model

    shapes = derive_shapes(cfg, {
        t: {"bs": getattr(args, f"{t}_bs"),
            "size": getattr(args, f"{t}_size")}
        for t in ("cls", "det", "seg")})

    model = build_model(cfg.model)
    ck = load_checkpoint(args.checkpoint)
    params = ck["params"]

    test_cfg = cfg.model.get("test_cfg", {}) or {}
    max_per_img = (test_cfg.get("det", {}) or {}).get("max_per_img", 300)
    img_norm = derive_img_norm(cfg)
    seg_test_cfg = test_cfg.get("seg")

    print(f"exporting tasks={args.tasks} shapes="
          f"{ {t: shapes[t] for t in args.tasks} } "
          f"platforms={args.platforms or [jax.default_backend()]}")
    img_dtype = jnp.uint8 if args.input_dtype == "uint8" else jnp.float32
    exported = export_inference(
        model, params, shapes, tasks=args.tasks, max_per_img=max_per_img,
        img_norm=img_norm, seg_test_cfg=seg_test_cfg,
        platforms=args.platforms, img_dtype=img_dtype)
    save_artifact(args.out, exported, params, shapes,
                  classes=ck["meta"].get("CLASSES"), img_norm=img_norm,
                  extra_meta={"config": os.path.basename(args.config)})
    for t in args.tasks:
        sz = os.path.getsize(os.path.join(args.out, f"{t}.stablehlo"))
        print(f"  {t}.stablehlo: {sz / 1e6:.2f} MB")
    print(f"artifact written to {args.out}")

    if args.check:
        fns, _meta = load_artifact(args.out, tasks=args.tasks)
        infer = make_infer_steps(model, max_per_img=max_per_img,
                                 img_norm=img_norm,
                                 seg_test_cfg=seg_test_cfg)
        rng = np.random.default_rng(0)
        ok = True
        from rscotr_tpu.export import _TASK_INPUT_NAMES
        for t in args.tasks:
            specs = task_input_specs(t, shapes[t]["bs"], shapes[t]["size"],
                                     img_dtype=img_dtype)
            inputs = []
            for name, s in zip(_TASK_INPUT_NAMES[t], specs):
                if name == "img":
                    if s.dtype == jnp.uint8:
                        inputs.append(jnp.asarray(rng.integers(
                            0, 256, size=s.shape).astype(np.uint8)))
                    else:
                        inputs.append(jnp.asarray(
                            rng.normal(size=s.shape).astype(s.dtype)))
                elif name == "img_hw":
                    inputs.append(jnp.full(s.shape, shapes[t]["size"],
                                           s.dtype))
                else:  # scale_factor — must stay positive (rescale divides)
                    inputs.append(jnp.ones(s.shape, s.dtype))
            got = jax.tree.leaves(fns[t](*inputs))
            want = jax.tree.leaves(infer[t](params, *inputs))
            match = all(np.allclose(np.asarray(g), np.asarray(w),
                                    atol=1e-5, rtol=1e-5)
                        for g, w in zip(got, want))
            print(f"  check {t}: {'OK' if match else 'MISMATCH'}")
            ok = ok and match
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    main()
