#!/usr/bin/env python
"""Parity-protocol driver (PARITY.md / BASELINE.md §parity): fixed-seed
forward dumps, dump comparison, and metric-vs-published comparison.

Subcommands:

  dump CONFIG CHECKPOINT --out fwd.npz [--seed 0]
      Build the config's model, load CHECKPOINT (orbax dir), run the
      jitted inference steps for every configured task on fixed seeded
      synthetic inputs at the config's static shapes, save the raw
      outputs (cls probs / det boxes+labels / seg logits) to an .npz.

  compare A.npz B.npz [--tol 1e-3]
      Elementwise max-|delta| per output; exit 1 if any exceeds --tol.
      B may come from any source that writes the same keys — e.g. a
      torch run of the reference checkpoint exported with
      numpy.savez(cls=..., det_boxes=..., det_labels=..., seg=...).

  metrics M.json --published PUB.json [--tol 0.3]
      Compare a tools/test.py --eval-out metrics file against published
      numbers (same keys; missing keys in M.json are an error). PUB.json
      values must already be in our metric scales (accuracy/mIoU/mF in
      PERCENT, bbox_mAP a 0..1 fraction — see BASELINE.md).

Rehearsed end-to-end (reverse-converted .pth as the stand-in for the
published HF weights) by tests/test_parity_runbook.py.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from rscotr_tpu.utils import (honor_jax_platforms_env,  # noqa: E402
                              setup_compile_cache)

honor_jax_platforms_env()
setup_compile_cache()


def cmd_dump(args):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from rscotr_tpu.apis import (derive_img_norm, derive_shapes,
                                 init_model_params)
    from rscotr_tpu.config import Config
    from rscotr_tpu.data import load_data_cfg
    from rscotr_tpu.engine import load_checkpoint, make_infer_steps
    from rscotr_tpu.models import build_model

    cfg = Config.fromfile(args.config)
    cfg = load_data_cfg(cfg)
    model = build_model(cfg.model)
    params = init_model_params(model, cfg)
    ck = load_checkpoint(args.checkpoint, target={"params": params})
    params = ck["params"]
    infer = make_infer_steps(
        model,
        max_per_img=(cfg.model.get("test_cfg", {}) or {}).get(
            "det", {}).get("max_per_img", 300),
        img_norm=derive_img_norm(cfg),
        seg_test_cfg=(cfg.model.get("test_cfg", {}) or {}).get("seg"))
    shapes = derive_shapes(cfg)
    rng = np.random.default_rng(args.seed)
    out = {}
    # fixed inputs: uint8-valued floats, already-normalized-free raw range
    # is wrong for float models — use N(0,1) like the config-agnostic
    # dryrun; what matters for parity is that both dumps use the SAME
    # seeded inputs
    if "cls" in shapes and getattr(model, "cls_head", None) is not None:
        x = rng.normal(size=(1,) + shapes["cls"][1:]).astype(np.float32)
        out["cls"] = np.asarray(infer["cls"](params, jnp.asarray(x)))
    if "det" in shapes and getattr(model, "bbox_head", None) is not None:
        s = shapes["det"]
        x = rng.normal(size=(1,) + s[1:]).astype(np.float32)
        hw = jnp.asarray([[s[1], s[2]]], jnp.int32)
        sf = jnp.ones((1, 4), jnp.float32)
        det, labels = infer["det"](params, jnp.asarray(x), hw, sf)
        out["det_boxes"] = np.asarray(det)
        out["det_labels"] = np.asarray(labels)
    if "seg" in shapes and getattr(model, "seg_head", None) is not None:
        x = rng.normal(size=(1,) + shapes["seg"][1:]).astype(np.float32)
        out["seg"] = np.asarray(infer["seg_logits"](params,
                                                    jnp.asarray(x)))
    np.savez(args.out, **out)
    for k, v in out.items():
        print(f"dump {k}: shape={v.shape} "
              f"mean={float(np.mean(v)):.6f}")
    print(f"wrote {args.out}")
    return 0


def cmd_compare(args):
    import numpy as np

    a = np.load(args.a)
    b = np.load(args.b)
    keys = sorted(set(a.files) & set(b.files))
    missing = sorted(set(a.files) ^ set(b.files))
    if missing:
        print(f"WARNING: keys only on one side: {missing}")
    worst = 0.0
    for k in keys:
        d = float(np.max(np.abs(a[k].astype(np.float64) -
                                b[k].astype(np.float64))))
        worst = max(worst, d)
        print(f"{k}: max|delta| = {d:.3e} "
              f"({'OK' if d <= args.tol else 'FAIL'} @ tol {args.tol})")
    if worst > args.tol:
        print("FORWARD PARITY: FAIL")
        return 1
    print("FORWARD PARITY: OK")
    return 0


def cmd_metrics(args):
    got = json.load(open(args.metrics))
    pub = json.load(open(args.published))
    fail = False
    for k, want in pub.items():
        if k not in got:
            print(f"{k}: MISSING from {args.metrics}")
            fail = True
            continue
        d = abs(float(got[k]) - float(want))
        ok = d <= args.tol
        fail = fail or not ok
        print(f"{k}: got={float(got[k]):.4f} published={float(want):.4f} "
              f"|delta|={d:.4f} ({'OK' if ok else 'FAIL'} @ tol "
              f"{args.tol})")
    print("METRIC PARITY:", "FAIL" if fail else "OK")
    return 1 if fail else 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump")
    d.add_argument("config")
    d.add_argument("checkpoint")
    d.add_argument("--out", required=True)
    d.add_argument("--seed", type=int, default=0)
    c = sub.add_parser("compare")
    c.add_argument("a")
    c.add_argument("b")
    c.add_argument("--tol", type=float, default=1e-3)
    m = sub.add_parser("metrics")
    m.add_argument("metrics")
    m.add_argument("--published", required=True)
    m.add_argument("--tol", type=float, default=0.3)
    args = ap.parse_args(argv)
    return {"dump": cmd_dump, "compare": cmd_compare,
            "metrics": cmd_metrics}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
