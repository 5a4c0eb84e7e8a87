#!/usr/bin/env python
"""Remap the 6th class color in rendered Potsdam seg maps.

Capability-equivalent of /root/reference/tools/seg_puzzles_and_cvt/
cvt_6class_to_5class.py: pure red (clutter) -> yellow-shifted.
"""

import argparse
import os

import numpy as np


def convert(img: np.ndarray, src=(255, 0, 0), dst=(255, 255, 0)):
    out = img.copy()
    mask = np.all(img[..., :3] == np.asarray(src), axis=-1)
    out[mask, :3] = dst
    return out


def main():
    from PIL import Image
    p = argparse.ArgumentParser()
    p.add_argument("in_dir")
    p.add_argument("out_dir")
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for f in sorted(os.listdir(args.in_dir)):
        if not f.lower().endswith((".png", ".jpg", ".tif")):
            continue
        img = np.asarray(Image.open(os.path.join(args.in_dir, f)))
        Image.fromarray(convert(img)).save(os.path.join(args.out_dir, f))
        print(f)


if __name__ == "__main__":
    main()
