#!/usr/bin/env python
"""One image -> three task outputs (cls label, det boxes png, seg map png).

Public-surface equivalent of /root/reference/tools/inference_one_img.py:
runs each dataset's test pipeline (minus LoadImageFromFile) on the same raw
image, then the per-task forward; prints the cls class and writes
seg_output.png / det_output.png.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from rscotr_tpu.utils import (honor_jax_platforms_env,
                              setup_compile_cache)

honor_jax_platforms_env()
setup_compile_cache()

from rscotr_tpu.config import Config, DictAction
from rscotr_tpu.data import collate_cls, collate_det, collate_seg, \
    load_data_cfg
from rscotr_tpu.data.pipelines import build_pipeline, run_pipeline
from rscotr_tpu.utils import (draw_det_results, draw_seg_results,
                              get_root_logger)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("img")
    p.add_argument("--out-dir", default=".")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--cfg-options", nargs="+", action=DictAction.action())
    return p.parse_args(argv)


def main(argv=None):
    import jax.numpy as jnp
    from PIL import Image

    args = parse_args(argv)
    logger = get_root_logger()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    cfg = load_data_cfg(cfg, config_root=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    from rscotr_tpu.engine import load_checkpoint, make_infer_steps
    from rscotr_tpu.models import build_model

    model = build_model(cfg.model)
    params = load_checkpoint(args.checkpoint)["params"]
    infer = make_infer_steps(
        model,
        max_per_img=(cfg.model.get("test_cfg", {}) or {}).get(
            "det", {}).get("max_per_img", 300),
        seg_test_cfg=(cfg.model.get("test_cfg", {}) or {}).get("seg"))

    raw = np.asarray(Image.open(args.img).convert("RGB"), np.float32)
    logger.info("image %s: %s", args.img, raw.shape)

    for name, entry in cfg.data.items():
        task = entry["task"]
        ds_cfg = entry["data"].get("test") or entry["data"].get("val")
        pipeline = build_pipeline((ds_cfg or {}).get("pipeline", []))
        res = {"img": raw.copy(), "ori_shape": raw.shape,
               "img_shape": raw.shape}
        res = run_pipeline(pipeline, res, np.random.default_rng(0))
        opts = dict(entry.get("loader", {}))

        if task == "cls":
            batch = collate_cls([{**res, "gt_label": np.int32(0)}])
            probs = np.asarray(infer["cls"](params,
                                            jnp.asarray(batch["img"])))[0]
            ds_classes = _classes_for(cfg, name)
            top = int(probs.argmax())
            label = ds_classes[top] if ds_classes else str(top)
            print(f"[cls/{name}] class = {label} (p={probs[top]:.3f})")
        elif task == "det":
            bucket = opts.get("det_bucket_hw", (800, 800))
            batch = collate_det([res], bucket, opts.get("max_gt", 100))
            det, labels = infer["det"](params, jnp.asarray(batch["img"]),
                                       jnp.asarray(batch["img_hw"]),
                                       jnp.asarray(batch["scale_factor"]))
            det = np.asarray(det)[0]
            labels = np.asarray(labels)[0]
            classes = _classes_for(cfg, name) or \
                [str(i) for i in range(100)]
            out = os.path.join(args.out_dir, "det_output.png")
            draw_det_results(raw, det, labels, classes, args.score_thr, out)
            n = int((det[:, 4] >= args.score_thr).sum())
            print(f"[det/{name}] {n} boxes >= {args.score_thr} -> {out}")
        elif task == "seg":
            size = opts.get("seg_size", 512)
            batch = collate_seg([res], size)
            seg = np.asarray(infer["seg"](params,
                                          jnp.asarray(batch["img"])))[0]
            h, w = batch["img_hw"][0]
            out = os.path.join(args.out_dir, "seg_output.png")
            draw_seg_results(raw, seg[:h, :w], out)
            print(f"[seg/{name}] seg map {seg.shape} -> {out}")


def _classes_for(cfg, name):
    entry = cfg.data[name]
    ds = entry["data"].get("test") or entry["data"].get("val") or {}
    return ds.get("classes")


if __name__ == "__main__":
    main()
