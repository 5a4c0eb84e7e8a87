#!/usr/bin/env python
"""Per-stage timing breakdown of the flagship MTL inference path.

Splits each task's forward into backbone+neck vs full forward, and times the
MSDA sampling core alone at encoder shapes, so the gather-bound fraction is
visible (SURVEY §5.1 profiling; the reference relies on mmcv IterTimerHook
only). Uses the same honesty discipline as bench.py: distinct inputs per
iteration, sync by device->host value read (block_until_ready does not sync
through the axon tunnel).

Usage: python tools/profile_breakdown.py [--iters 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rscotr_tpu.utils import (honor_jax_platforms_env,  # noqa: E402
                              setup_compile_cache)

honor_jax_platforms_env()
setup_compile_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    args = p.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from rscotr_tpu.config import Config
    from rscotr_tpu.data import load_data_cfg
    from rscotr_tpu.engine import make_infer_steps
    from rscotr_tpu.models import build_model
    from rscotr_tpu.ops.ms_deform_attn import ms_deform_attn

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(os.path.join(
        root, "configs/multi/MTL_slvlcls_swin-t-p4-w7_1x1_"
              "resisc_dior_potsdam.py"))
    cfg = load_data_cfg(cfg, config_root=root)
    model = build_model(cfg.model)

    rng = jax.random.key(0)
    cls_img = jax.random.normal(rng, (16, 224, 224, 3), jnp.float32)
    det_img = jax.random.normal(rng, (1, 800, 800, 3), jnp.float32)
    det_hw = jnp.asarray([[800, 800]], jnp.int32)
    det_sf = jnp.ones((1, 4), jnp.float32)
    seg_img = jax.random.normal(rng, (2, 512, 512, 3), jnp.float32)
    params = model.init(rng, cls_img=cls_img[:1], det_img=det_img[:1],
                        det_img_hw=det_hw[:1], seg_img=seg_img[:1])
    infer = make_infer_steps(model, max_per_img=300)

    def feat_fn(params, img):
        nk, _ = model.apply(params, img, deterministic=True,
                            method=model.extract_feat)
        return nk

    feat = jax.jit(feat_fn)

    # MSDA core at encoder shapes (6 dependent layers inside one jit)
    def msda6(value, locs, attn, shapes):
        v = value
        for _ in range(6):
            v = ms_deform_attn(v, shapes, locs, attn).reshape(v.shape)
        return v

    def msda_args(key, B, shapes, dtype):
        nv = sum(h * w for h, w in shapes)
        ks = jax.random.split(key, 3)
        value = jax.random.normal(ks[0], (B, nv, 8, 32), dtype)
        locs = jax.random.uniform(ks[1], (B, nv, 8, len(shapes), 4, 2),
                                  jnp.float32)
        attn = jax.nn.softmax(
            jax.random.normal(ks[2], (B, nv, 8, len(shapes), 4)), axis=(-1,))
        return value, locs, attn

    det_shapes = ((100, 100), (50, 50), (25, 25), (13, 13))
    seg_shapes = ((64, 64), (32, 32), (16, 16), (8, 8))
    dt = jnp.bfloat16 if "bfloat16" in str(cfg.model) else jnp.float32
    msda_det = msda_args(rng, 1, det_shapes, dt)
    msda_seg = msda_args(rng, 2, seg_shapes, dt)
    msda_j = {
        "det": jax.jit(lambda v, l, a: msda6(v, l, a, det_shapes)),
        "seg": jax.jit(lambda v, l, a: msda6(v, l, a, seg_shapes)),
    }

    def _sync(out):
        leaf = jax.tree.leaves(out)[0]
        return np.asarray(leaf.ravel()[0])

    def timeit(fn, base_args, perturb_idx=0):
        variants = []
        for i in range(args.iters):
            vs = list(base_args)
            a = vs[perturb_idx]
            vs[perturb_idx] = a + jnp.asarray(1e-3 * (i + 1), a.dtype)
            variants.append(tuple(vs))
        for v in variants:
            for a in v:
                _sync(a)
        for _ in range(args.warmup):
            _sync(fn(*variants[0]))
        t0 = time.perf_counter()
        out = None
        for i in range(args.iters):
            out = fn(*variants[i])
        _sync(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    res = {}
    res["cls_full_ms"] = timeit(lambda i: infer["cls"](params, i),
                                (cls_img,))
    res["det_feat_ms"] = timeit(lambda i: feat(params, i), (det_img,))
    res["det_full_ms"] = timeit(
        lambda i: infer["det"](params, i, det_hw, det_sf), (det_img,))
    res["seg_feat_ms"] = timeit(lambda i: feat(params, i), (seg_img,))
    res["seg_full_ms"] = timeit(lambda i: infer["seg"](params, i),
                                (seg_img,))
    res["msda6_det_ms"] = timeit(
        lambda v: msda_j["det"](v, *msda_det[1:]), (msda_det[0],))
    res["msda6_seg_ms"] = timeit(
        lambda v: msda_j["seg"](v, *msda_seg[1:]), (msda_seg[0],))
    res["det_head_ms"] = round(res["det_full_ms"] - res["det_feat_ms"], 2)
    res["seg_head_ms"] = round(res["seg_full_ms"] - res["seg_feat_ms"], 2)
    res = {k: round(v, 2) for k, v in res.items()}
    res["device"] = getattr(jax.devices()[0], "device_kind",
                            str(jax.devices()[0]))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
