#!/usr/bin/env python
"""DIOR (det, 800x800) backbone featmap visualization over a folder.

Capability-equivalent of /root/reference/tools/featmap_vis/
dior_vis_featmap.py."""
from _common import folder_main

if __name__ == "__main__":
    folder_main("det")
