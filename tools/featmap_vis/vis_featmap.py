#!/usr/bin/env python
"""Backbone feature-map visualization: top-k channel heatmaps over images.

Capability-equivalent of /root/reference/tools/featmap_vis/ (draw_featmap +
vis_featmap*): build the bare backbone from a config, run images, render
mean / top-k-channel activation heatmaps blended onto the input.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from rscotr_tpu.config import Config  # noqa: E402


def draw_featmap(featmap: np.ndarray, img: np.ndarray, channel_reduction
                 ="squeeze_mean", topk: int = 4, alpha: float = 0.5):
    """featmap: (H', W', C); img: (H, W, 3) uint8-range float.

    Returns list of blended uint8 images (1 for squeeze_mean, topk for
    select_max).
    """
    from PIL import Image

    def blend(channel):
        c = channel - channel.min()
        c = c / max(c.max(), 1e-6)
        heat = np.zeros((*c.shape, 3), np.float32)
        heat[..., 0] = 255 * c                  # red channel heat
        heat[..., 2] = 255 * (1 - c)
        heat_im = Image.fromarray(heat.astype(np.uint8)).resize(
            (img.shape[1], img.shape[0]), Image.BILINEAR)
        out = np.asarray(heat_im, np.float32) * alpha + img * (1 - alpha)
        return np.clip(out, 0, 255).astype(np.uint8)

    if channel_reduction == "squeeze_mean":
        return [blend(featmap.mean(-1))]
    # select_max: top-k channels by spatial max activation
    order = np.argsort(-featmap.max(axis=(0, 1)))[:topk]
    return [blend(featmap[..., ci]) for ci in order]


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from rscotr_tpu.engine import load_checkpoint
    from rscotr_tpu.models.build import build_backbone

    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("img")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out-dir", default="featmap_vis_out")
    p.add_argument("--level", type=int, default=0)
    p.add_argument("--topk", type=int, default=4)
    p.add_argument("--size", type=int, default=224)
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    cfg = Config.fromfile(args.config)
    backbone = build_backbone(cfg.model["backbone"])

    raw = Image.open(args.img).convert("RGB").resize((args.size, args.size))
    img = np.asarray(raw, np.float32)
    x = jnp.asarray((img - np.array([123.675, 116.28, 103.53])) /
                    np.array([58.395, 57.12, 57.375]))[None]

    if args.checkpoint:
        params = load_checkpoint(args.checkpoint)["params"]
        params = {"params": params["params"]["backbone"]}
    else:
        params = backbone.init(jax.random.key(0), x)
    feats = backbone.apply(params, x)
    fm = np.asarray(feats[args.level][0])

    outs = draw_featmap(fm, img, channel_reduction="select_max",
                        topk=args.topk)
    for i, o in enumerate(outs):
        path = os.path.join(args.out_dir,
                            f"featmap_l{args.level}_top{i}.png")
        Image.fromarray(o).save(path)
        print(path)


if __name__ == "__main__":
    main()
