"""Single-image inference (the reference tools/test_single_forward.py
minimal API example): load a model, resize an image, run tiled inference,
save colorized + uint16 depth PNGs."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("image")
    p.add_argument("--ckp-path", default=None,
                   help="HF snapshot dir or coarse,fine,fusion .pth triple")
    p.add_argument("--config",
                   default="configs/patchfusion_depthanything/"
                           "depthanything_vitl_patchfusion_u4k.py")
    p.add_argument("--cai-mode", default="m1")
    p.add_argument("--process-num", type=int, default=4)
    p.add_argument("--chunk-policy", default="divisor",
                   choices=["greedy", "divisor"],
                   help="divisor (default here): one compiled chunk body "
                        "— ~2/3 the cold compile at ~9%% runtime cost, the "
                        "right tradeoff for a single-image run. Eval "
                        "sweeps (tools/test.py) default to greedy.")
    p.add_argument("--mesh", default="auto",
                   choices=["auto", "patch", "none"],
                   help="shard the tile batch over a `patch` device mesh "
                        "(ICI tile parallelism); auto = when >1 device")
    p.add_argument("--image-raw-shape", nargs="+", type=int,
                   default=[2160, 3840])
    p.add_argument("--out", default="depth.png")
    args = p.parse_args()

    from patchfusion_tpu.api import PatchFusion
    from patchfusion_tpu.config import Config
    from patchfusion_tpu.data.general import _resize_bicubic_ac
    from patchfusion_tpu.utils.colorize import save_depth_png

    if args.ckp_path and os.path.isdir(args.ckp_path):
        model = PatchFusion.from_pretrained(args.ckp_path)
    else:
        cfg = Config.fromfile(args.config)
        ckpts = None
        if args.ckp_path:
            parts = args.ckp_path.split(",")
            ckpts = (parts[0], parts[1],
                     parts[2] if len(parts) > 2 else None)
        model = PatchFusion.from_config(cfg.model["config"], ckpts=ckpts)

    img = np.asarray(Image.open(args.image).convert("RGB"),
                     np.float32) / 255.0
    if img.shape[:2] != tuple(args.image_raw_shape):
        img = np.clip(_resize_bicubic_ac(img, args.image_raw_shape), 0, 1)
    image_lr = model.resizer(np.asarray(img)[None])

    from patchfusion_tpu.parallel.mesh import resolve_cli_mesh
    mesh = resolve_cli_mesh(args.mesh)
    depth = model.infer(np.asarray(image_lr), img, cai_mode=args.cai_mode,
                        process_num=args.process_num,
                        image_raw_shape=tuple(args.image_raw_shape),
                        mesh=mesh, chunk_policy=args.chunk_policy)
    base, ext = os.path.splitext(args.out)
    save_depth_png(depth, args.out, base + "_uint16.png")
    print(f"depth: {depth.shape}, range [{depth.min():.3f}, "
          f"{depth.max():.3f}] -> {args.out}")


if __name__ == "__main__":
    main()
