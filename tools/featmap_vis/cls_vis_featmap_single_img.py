#!/usr/bin/env python
"""RESISC45 (cls) featmap visualization for one image.

Capability-equivalent of /root/reference/tools/featmap_vis/
cls_vis_featmap_single_img.py."""
from _common import single_img_main

if __name__ == "__main__":
    single_img_main("cls")
