#!/usr/bin/env python
"""Potsdam (seg, 512x512) featmap visualization for one image.

Capability-equivalent of /root/reference/tools/featmap_vis/
seg_vis_featmap_single_img.py."""
from _common import single_img_main

if __name__ == "__main__":
    single_img_main("seg")
