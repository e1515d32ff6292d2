"""Fabricate a small U4K-format dataset for smoke/demo training runs.

Generates N 4K scenes in the UnrealStereo4K on-disk layout the loader
expects (data/u4k.py; reference estimator/datasets/u4k_dataset.py:118-137):
`scene_XX/Image0/*.raw` uint8 BGR images, `Disp0/*.npy` float32 disparity,
`Extrinsics{0,1}/*.txt` (focal + baseline -> depth_factor), plus train/val
split files.

The scenes are procedural but learnable: depth is a smooth low-frequency
field with a few planar "objects", and the image is a deterministic
function of depth (shading + albedo bands), so a fusion head can actually
reduce the training loss — this backs the demonstrated `tools/train.py`
run recorded in BASELINE.md, not just the profiled step.

Usage: python tools/make_synth_u4k.py --root /tmp/u4k_synth --n-train 8
"""

import argparse
import os

import cv2
import numpy as np


def lowfreq(rng, shape, cells=(6, 10), lo=0.0, hi=1.0):
    """Smooth random field in [lo, hi] via bilinear-upsampled noise.

    One cv2.resize C call: per-pixel numpy arithmetic at 4K is minutes on
    small 1-vCPU hosts (slow first-touch page faults), so big-array work is
    kept to single C-level passes throughout this module.
    """
    coarse = rng.random((cells[0], cells[1])).astype(np.float32)
    coarse = np.float32(lo) + np.float32(hi - lo) * coarse
    return cv2.resize(coarse, (shape[1], shape[0]),
                      interpolation=cv2.INTER_LINEAR)


def make_scene(rng, h=2160, w=3840):
    depth = lowfreq(rng, (h, w), cells=(5, 8), lo=4.0, hi=60.0)
    # planar rectangles at distinct depths (sharp boundaries for the
    # boundary/SEE metrics to latch onto)
    for _ in range(rng.integers(3, 7)):
        rh, rw = rng.integers(h // 10, h // 3), rng.integers(w // 10, w // 3)
        y, x = rng.integers(0, h - rh), rng.integers(0, w - rw)
        depth[y:y + rh, x:x + rw] = np.float32(rng.uniform(2.0, 30.0))
    # image = shading from depth + albedo stripes (invertible enough that
    # depth is predictable from the image); built channel-by-channel into a
    # preallocated uint8 buffer to minimize full-res temporaries
    shade = np.float32(1.0) / (np.float32(1.0) + depth * np.float32(0.05))
    albedo = np.float32(0.25) + np.float32(0.75) * lowfreq(
        rng, (h, w), cells=(8, 14))
    img8 = np.empty((h, w, 3), np.uint8)
    np.multiply(shade, albedo * np.float32(255.0), out=albedo)
    img8[..., 0] = albedo  # float->uint8 C-cast truncates; range is [0,255]
    np.subtract(np.float32(255.0), albedo * np.float32(0.5), out=albedo)
    np.multiply(shade, albedo, out=albedo)
    img8[..., 1] = albedo
    np.multiply(shade, np.float32(0.7 * 255.0), out=shade)
    np.add(shade, np.float32(0.3 * 255.0), out=shade)
    np.clip(shade, 0, 255, out=shade)
    img8[..., 2] = shade
    return img8, depth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n-train", type=int, default=8)
    ap.add_argument("--n-val", type=int, default=2)
    ap.add_argument("--oversample", type=int, default=16,
                    help="also write train_x{N}.txt with the train list "
                         "repeated N times (gives the demo training config "
                         "enough steps per epoch from few 4K scenes)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--height", type=int, default=2160)
    ap.add_argument("--width", type=int, default=3840)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    focal, base = 100.0, 0.5  # depth_factor = 50
    lines = []
    for i in range(args.n_train + args.n_val):
        scene = os.path.join(args.root, f"scene_{i:02d}")
        for sub in ("Image0", "Disp0", "Extrinsics0", "Extrinsics1"):
            os.makedirs(os.path.join(scene, sub), exist_ok=True)
        img8, depth = make_scene(rng, args.height, args.width)
        # loader reads BGR raw (u4k.py:96-100)
        img8[..., ::-1].tofile(os.path.join(scene, "Image0", "00000.raw"))
        disp = (focal * base) / depth
        np.save(os.path.join(scene, "Disp0", "00000.npy"), disp)
        with open(os.path.join(scene, "Extrinsics0", "00000.txt"), "w") as f:
            f.write(f"{focal} 0 0\n0 0 0 0.0\n")
        with open(os.path.join(scene, "Extrinsics1", "00000.txt"), "w") as f:
            f.write(f"{focal} 0 0\n0 0 0 {base}\n")
        rel = f"scene_{i:02d}"
        lines.append(f"{rel}/Image0/00000.png x {rel}/Disp0/00000.npy y\n")

    with open(os.path.join(args.root, "train.txt"), "w") as f:
        f.writelines(lines[:args.n_train])
    with open(os.path.join(args.root, "val.txt"), "w") as f:
        f.writelines(lines[args.n_train:])
    if args.oversample > 1:
        # the split consumed by configs/demo/train_fusion_synth_vitl.py:
        # each epoch re-visits every scene N times (different random crops
        # per visit via the dataset augs), so batch-2 training gets
        # n_train * N / 2 steps per epoch
        name = f"train_x{args.oversample}.txt"
        with open(os.path.join(args.root, name), "w") as f:
            f.writelines(lines[:args.n_train] * args.oversample)
    print(f"wrote {args.n_train} train + {args.n_val} val scenes under "
          f"{args.root}")


if __name__ == "__main__":
    main()
