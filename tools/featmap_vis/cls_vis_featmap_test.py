#!/usr/bin/env python
"""RESISC45 (cls) featmap visualization over the config's test split.

Capability-equivalent of /root/reference/tools/featmap_vis/
cls_vis_featmap_test.py."""
from _common import test_split_main

if __name__ == "__main__":
    test_split_main("cls")
