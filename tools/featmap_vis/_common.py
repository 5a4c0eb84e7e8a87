"""Shared plumbing for the featmap-vis CLIs.

Capability-equivalent of the boilerplate the reference duplicates across
/root/reference/tools/featmap_vis/{vis,cls_vis,dior_vis,seg_vis}*.py:
build the bare backbone from a config, load checkpoint backbone params,
preprocess per task, iterate an image folder, save top-k channel montages.
"""

from __future__ import annotations

import os
import sys
from typing import Iterable, Optional, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rscotr_tpu.config import Config  # noqa: E402
from rscotr_tpu.utils import (honor_jax_platforms_env,  # noqa: E402
                              setup_compile_cache)

honor_jax_platforms_env()
setup_compile_cache()

# ImageNet mean/std in 0-255 range (reference img_norm_cfg)
MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)

TASK_SIZE = {"cls": 224, "seg": 512, "det": 800}


def load_backbone(config_path: str, checkpoint: Optional[str] = None,
                  probe_size: int = 224):
    """Returns (backbone_module, variables) from a config (+ checkpoint)."""
    import jax
    import jax.numpy as jnp

    from rscotr_tpu.engine import load_checkpoint
    from rscotr_tpu.models.build import build_backbone

    cfg = Config.fromfile(config_path)
    backbone = build_backbone(cfg.model["backbone"])
    x = jnp.zeros((1, probe_size, probe_size, 3))
    variables = backbone.init(jax.random.key(0), x)
    if checkpoint:
        ck = load_checkpoint(checkpoint)
        variables = {"params": ck["params"]["params"]["backbone"]}
    return backbone, variables


def preprocess(img: np.ndarray, size: Optional[int] = None) -> np.ndarray:
    """uint8 (H, W, 3) -> normalized float (1, S, S, 3)."""
    from PIL import Image

    if size is not None:
        img = np.asarray(
            Image.fromarray(np.asarray(img, np.uint8)).resize(
                (size, size), Image.BILINEAR))
    x = (np.asarray(img, np.float32) - MEAN) / STD
    return x[None]


def run_backbone(backbone, variables, x: np.ndarray):
    """-> list of (H', W', C) numpy feature maps (one per out level)."""
    import jax.numpy as jnp

    feats = backbone.apply(variables, jnp.asarray(x))
    return [np.asarray(f[0]) for f in feats]


def iter_images(root: str) -> Iterable[Tuple[str, np.ndarray]]:
    """Yield (path, uint8 image) for every image under root (folder or
    class-subfolder layout)."""
    from PIL import Image

    exts = (".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp")
    for dirpath, _, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.lower().endswith(exts):
                path = os.path.join(dirpath, f)
                yield path, np.asarray(Image.open(path).convert("RGB"))


def save_featmaps(feats, img: np.ndarray, img_path: str, out_dir: str,
                  topk: int = 20, levels=None) -> None:
    """Render each requested level's top-k montage next to out_dir."""
    from PIL import Image

    from draw_featmap import draw_featmap  # noqa: E402 (sibling import)

    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(img_path))[0]
    levels = range(len(feats)) if levels is None else levels
    for lvl in levels:
        grid = draw_featmap(feats[lvl], img, channel_reduction=None,
                            topk=topk)
        out = os.path.join(out_dir, f"{stem}_l{lvl}_top{topk}.png")
        Image.fromarray(grid).save(out)
        print(out)


def folder_main(task: str, argv=None) -> None:
    """Common CLI: config + checkpoint + image folder -> montages."""
    import argparse

    p = argparse.ArgumentParser(
        description=f"{task} backbone featmap visualization")
    p.add_argument("config")
    p.add_argument("img_root", help="folder of images (class subfolders ok)")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out-dir", default=f"featmap_vis_{task}")
    p.add_argument("--topk", type=int, default=20)
    p.add_argument("--levels", type=int, nargs="*", default=None)
    p.add_argument("--size", type=int, default=None)
    args = p.parse_args(argv)

    size = args.size or TASK_SIZE.get(task, 224)
    backbone, variables = load_backbone(args.config, args.checkpoint,
                                        probe_size=size)
    for path, img in iter_images(args.img_root):
        feats = run_backbone(backbone, variables, preprocess(img, size))
        from PIL import Image
        disp = np.asarray(Image.fromarray(img).resize((size, size)))
        save_featmaps(feats, disp, path, args.out_dir, topk=args.topk,
                      levels=args.levels)


def single_img_main(task: str, argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(
        description=f"{task} featmap visualization (single image)")
    p.add_argument("config")
    p.add_argument("img")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out-dir", default=f"featmap_vis_{task}")
    p.add_argument("--topk", type=int, default=20)
    p.add_argument("--levels", type=int, nargs="*", default=None)
    p.add_argument("--size", type=int, default=None)
    args = p.parse_args(argv)

    from PIL import Image

    size = args.size or TASK_SIZE.get(task, 224)
    backbone, variables = load_backbone(args.config, args.checkpoint,
                                        probe_size=size)
    img = np.asarray(Image.open(args.img).convert("RGB"))
    feats = run_backbone(backbone, variables, preprocess(img, size))
    disp = np.asarray(Image.fromarray(img).resize((size, size)))
    save_featmaps(feats, disp, args.img, args.out_dir, topk=args.topk,
                  levels=args.levels)


def test_split_main(task: str, argv=None) -> None:
    """Visualize over the config's test split (first N samples)."""
    import argparse

    p = argparse.ArgumentParser(
        description=f"{task} featmap visualization (test split)")
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out-dir", default=f"featmap_vis_{task}_test")
    p.add_argument("--topk", type=int, default=20)
    p.add_argument("--num", type=int, default=8)
    p.add_argument("--size", type=int, default=None)
    args = p.parse_args(argv)

    from rscotr_tpu.data import build_datasets, load_data_cfg

    size = args.size or TASK_SIZE.get(task, 224)
    cfg = Config.fromfile(args.config)
    cfg = load_data_cfg(cfg)
    backbone, variables = load_backbone(args.config, args.checkpoint,
                                        probe_size=size)
    datasets = build_datasets(cfg.data, split="test") or \
        build_datasets(cfg.data, split="val")
    for name, ds in datasets.items():
        if ds.task != task:
            continue
        for i in range(min(args.num, len(ds))):
            s = ds[i]
            img = np.asarray(s["img"], np.uint8) if "img" in s else None
            if img is None:
                continue
            feats = run_backbone(backbone, variables,
                                 preprocess(img, size))
            from PIL import Image
            disp = np.asarray(Image.fromarray(img).resize((size, size)))
            save_featmaps(feats, disp, f"{name}_{i}.png", args.out_dir,
                          topk=args.topk)
