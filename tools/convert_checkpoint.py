"""Checkpoint conversion CLI (the reference tools/convert_huggingface.py
analogue): import the reference's torch .pth checkpoints (coarse + fine +
fusion) and export a native patchfusion_tpu msgpack weights file, usable by
PatchFusion.from_config / tools/test.py."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--coarse", required=True, help="coarse branch .pth")
    p.add_argument("--fine", required=True, help="fine branch .pth")
    p.add_argument("--fusion", default=None, help="fusion-only .pth")
    p.add_argument("--save-path", required=True, help="output .msgpack")
    args = p.parse_args()

    from patchfusion_tpu.config import Config
    from patchfusion_tpu.convert import branch_conversion_spec
    from patchfusion_tpu.engine.checkpoint import (
        load_patchfusion_from_torch, save_params)

    cfg = Config.fromfile(args.config)
    mc = cfg.model["config"]
    family, vit_depth, grid = branch_conversion_spec(mc)
    fusion_depths = tuple(mc["guided_fusion"].get("depth",
                                                  (2, 2, 3, 3, 4, 4)))
    params, stats = load_patchfusion_from_torch(
        args.coarse, args.fine, args.fusion, vit_depth, fusion_depths,
        family=family, grid=grid)
    save_params(args.save_path, params, stats)
    print(f"wrote {args.save_path}")


if __name__ == "__main__":
    main()
