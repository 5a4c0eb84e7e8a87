#!/usr/bin/env python
"""Re-assemble per-tile Potsdam segmentation predictions into full scenes.

Capability-equivalent of /root/reference/tools/seg_puzzles/
puzzles_potsdam.py:12-40: tile files named
``{scene}_{id}_{l}_{u}_{r}_{d}.png`` encode their crop box; paste each crop
at its position to rebuild the 6000x6000 scene maps.
"""

import argparse
import os
import re
import sys
from collections import defaultdict

import numpy as np

TILE_RE = re.compile(
    r"^(?P<scene>.+?)_(?P<id>\d+)_(?P<l>\d+)_(?P<u>\d+)_(?P<r>\d+)_"
    r"(?P<d>\d+)\.(png|tif|jpg)$")


def collect_puzzles_info(tile_dir):
    scenes = defaultdict(list)
    for f in sorted(os.listdir(tile_dir)):
        m = TILE_RE.match(f)
        if not m:
            continue
        g = m.groupdict()
        scenes[f"{g['scene']}_{g['id']}"].append(
            (os.path.join(tile_dir, f),
             int(g["l"]), int(g["u"]), int(g["r"]), int(g["d"])))
    return scenes


def get_whole_fig(tiles):
    from PIL import Image
    w = max(t[3] for t in tiles)
    h = max(t[4] for t in tiles)
    sample = np.asarray(Image.open(tiles[0][0]))
    canvas = np.zeros((h, w) + sample.shape[2:], sample.dtype)
    for path, l, u, r, d in tiles:
        im = np.asarray(Image.open(path))
        canvas[u:d, l:r] = im[:d - u, :r - l]
    return canvas


def main():
    from PIL import Image
    p = argparse.ArgumentParser()
    p.add_argument("tile_dir")
    p.add_argument("out_dir")
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    scenes = collect_puzzles_info(args.tile_dir)
    for name, tiles in scenes.items():
        canvas = get_whole_fig(tiles)
        out = os.path.join(args.out_dir, f"{name}.png")
        Image.fromarray(canvas).save(out)
        print(f"{name}: {len(tiles)} tiles -> {out} {canvas.shape}")


if __name__ == "__main__":
    main()
