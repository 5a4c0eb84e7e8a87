#!/usr/bin/env python
"""Backbone featmap visualization for one image (generic sizes).

Capability-equivalent of /root/reference/tools/featmap_vis/
vis_featmap_single_img.py."""
from _common import single_img_main

if __name__ == "__main__":
    single_img_main("cls")
