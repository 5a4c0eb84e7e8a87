#!/usr/bin/env python
"""RESISC45 (cls) backbone featmap visualization over an image folder.

Capability-equivalent of /root/reference/tools/featmap_vis/
cls_vis_featmap.py (ImageFolder loop -> top-k channel montages)."""
from _common import folder_main

if __name__ == "__main__":
    folder_main("cls")
