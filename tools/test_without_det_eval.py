#!/usr/bin/env python
"""Alias of tools/test.py (the reference ships a byte-identical duplicate,
SURVEY.md §2.1); kept for public-surface parity."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from tools.test import main  # noqa: E402

if __name__ == "__main__":
    main()
