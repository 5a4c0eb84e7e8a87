#!/usr/bin/env python
"""Benchmark harness — MTL inference throughput (RESISC45+DIOR+Potsdam mix).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

Measures the flagship MTL architecture (Swin-T + shared 6-layer deformable
encoder + 3 heads) on one chip: a mix unit = 16 cls images (224^2) + 1 det
image (800^2) + 2 seg images (512^2), mirroring the co-training per-step
batch mix. vs_baseline is measured img/s divided by an estimated A100
PyTorch reference for the same mix (see BASELINE.md: the reference repo
publishes no numbers; the A100 estimate derives from public Swin-T DINO /
Mask2Former throughput figures and is replaced by a measured number when
one exists in BASELINE.json)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Estimated A100 (PyTorch, fp16) throughput for the same mix unit:
# DINO Swin-T ~13 img/s det + Mask2Former ~22 img/s seg + Swin-T cls
# ~800 img/s -> one mix unit (16 cls + 1 det + 2 seg) ~ 5.3 units/s
# -> ~19 img/s per-image aggregate. Conservative published-figure estimate.
A100_BASELINE_IMG_S = 19.0

CLS_BS, DET_BS, SEG_BS = 16, 1, 2
WARMUP, ITERS = 2, 8


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rscotr_tpu.config import Config
    from rscotr_tpu.data import load_data_cfg
    from rscotr_tpu.engine import make_infer_steps
    from rscotr_tpu.models import build_model

    root = os.path.dirname(os.path.abspath(__file__))
    cfg = Config.fromfile(os.path.join(
        root, "configs/multi/MTL_slvlcls_swin-t-p4-w7_1x1_"
              "resisc_dior_potsdam.py"))
    cfg = load_data_cfg(cfg, config_root=root)
    model = build_model(cfg.model)

    rng = jax.random.key(0)
    cls_img = jax.random.normal(rng, (CLS_BS, 224, 224, 3),
                                dtype=jnp.float32)
    det_img = jax.random.normal(rng, (DET_BS, 800, 800, 3),
                                dtype=jnp.float32)
    det_hw = jnp.asarray([[800, 800]] * DET_BS, jnp.int32)
    det_sf = jnp.ones((DET_BS, 4), jnp.float32)
    seg_img = jax.random.normal(rng, (SEG_BS, 512, 512, 3),
                                dtype=jnp.float32)

    params = model.init(rng, cls_img=cls_img[:1], det_img=det_img[:1],
                        det_img_hw=det_hw[:1], seg_img=seg_img[:1])
    infer = make_infer_steps(model, max_per_img=300)

    def mix_unit():
        a = infer["cls"](params, cls_img)
        b, c = infer["det"](params, det_img, det_hw, det_sf)
        d = infer["seg"](params, seg_img)
        jax.block_until_ready((a, b, c, d))

    for _ in range(WARMUP):
        mix_unit()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        mix_unit()
    dt = time.perf_counter() - t0

    imgs = ITERS * (CLS_BS + DET_BS + SEG_BS)
    img_s = imgs / dt
    print(json.dumps({
        "metric": "img/s/chip MTL inference (RESISC45+DIOR+Potsdam mix)",
        "value": round(img_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_s / A100_BASELINE_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
