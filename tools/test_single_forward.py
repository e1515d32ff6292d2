"""Minimal single-forward API example (the reference file of the same name):
thin alias for tools/infer.py — `python tools/test_single_forward.py
<image> [--ckp-path ...] [--cai-mode r128]`."""

import runpy
import os
import sys

if __name__ == "__main__":
    sys.argv[0] = os.path.join(os.path.dirname(__file__), "infer.py")
    runpy.run_path(sys.argv[0], run_name="__main__")
