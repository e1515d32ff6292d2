"""Per-op roofline floors for the DINOv2 trunk at tile-chunk shapes.

The fine-branch trunk (171 ms at batch 16, 35% MFU) is the largest single
stage in the p49 pipeline after the fusion U-Net. Its attention is a proven
floor (tools/profile_attn.py shootout). This tool measures the REMAINING
ops standalone at their exact in-model shapes — the qkv/proj/fc1/fc2
matmuls (2D-collapsed and 3D-batched forms), LayerNorm, tanh-GELU, and the
residual/layerscale elementwise chain — so the trunk's measured time can be
compared against the sum of its measured per-op floors (the VERDICT r4 #2
roofline table).

Usage: python tools/profile_trunk.py [--core vitl] [--batch 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PEAK = 197.0  # v5e bf16 TFLOP/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--core", default="vitl")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--inner", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tools._bench_util import device_time
    from patchfusion_tpu.models.dinov2 import VIT_CONFIGS
    from patchfusion_tpu.ops.activations import gelu

    cfg = VIT_CONFIGS[args.core]
    d = cfg["embed_dim"]
    depth = cfg["depth"]
    b = args.batch
    h, w = 392, 518
    n = (h // 14) * (w // 14) + 1  # 1036 patch tokens + cls
    hidden = int(d * 4)
    rng = np.random.default_rng(0)
    peak = PEAK if jax.default_backend() == "tpu" else None

    def mk(shape):
        return jax.device_put(rng.standard_normal(shape, np.float32)
                              .astype(np.float32)).astype(jnp.bfloat16)

    def row(name, fn, first, *rest, flops=None):
        t = device_time(fn, (first, *rest), inner=args.inner)
        extra = ""
        if flops:
            tf = flops / t / 1e12
            extra = f"  {flops / 1e9:9.1f} GFLOP  {tf:6.1f} TF/s"
            if peak:
                extra += f"  MFU {tf / peak * 100:5.1f}%"
        print(f"{name:26s} {t * 1e3:8.3f} ms{extra}", flush=True)
        return t

    x2 = mk((b * n, d))
    x3 = mk((b, n, d))
    w_qkv = mk((d, 3 * d))
    w_proj = mk((d, d))
    w_fc1 = mk((d, hidden))
    w_fc2 = mk((hidden, d))
    h2 = mk((b * n, hidden))
    h3 = mk((b, n, hidden))

    mm = lambda a, w_: jnp.dot(a, w_, preferred_element_type=jnp.bfloat16)
    fl = lambda k_, n_: 2.0 * b * n * k_ * n_

    # timer-overhead calibration: the scan body's barrier + max(out) +
    # x+dep add, measured with fn=identity at the main activation shape.
    # Subtract this from the per-op rows below to get the op's own time.
    row("timer overhead (id x3)", lambda y: y, x3)
    row("timer overhead (id h3)", lambda y: y, h3)

    t_qkv = row("qkv 2d", mm, x2, w_qkv, flops=fl(d, 3 * d))
    row("qkv 3d", mm, x3, w_qkv, flops=fl(d, 3 * d))
    t_proj = row("proj 2d", mm, x2, w_proj, flops=fl(d, d))
    t_fc1 = row("fc1 2d", mm, x2, w_fc1, flops=fl(d, hidden))
    t_fc2 = row("fc2 2d", mm, h2, w_fc2, flops=fl(hidden, d))
    row("fc2 3d", mm, h3, w_fc2, flops=fl(hidden, d))

    # elementwise / normalization floors at in-model shapes
    ln_g, ln_b = mk((d,)), mk((d,))

    def ln(y, g, b_):
        yf = y.astype(jnp.float32)
        m = yf.mean(-1, keepdims=True)
        v = ((yf - m) ** 2).mean(-1, keepdims=True)
        return (((yf - m) * jax.lax.rsqrt(v + 1e-6)).astype(y.dtype)
                * g + b_)

    t_ln = row("layernorm (b,n,d)", ln, x3, ln_g, ln_b)
    t_gelu = row("gelu (b,n,4d)", lambda y: gelu(y), h3)
    ls = mk((d,))
    t_res = row("residual+layerscale", lambda y, s: y + y * s, x3, ls)

    per_layer = t_qkv + t_proj + t_fc1 + t_fc2 + 2 * t_ln + t_gelu + 2 * t_res
    attn_floor = 3.184e-3 if args.core == "vitl" else None
    print(f"\nper-layer linear+elementwise floor: {per_layer * 1e3:.3f} ms")
    if attn_floor:
        total = depth * (per_layer + attn_floor)
        print(f"trunk floor = {depth} x (that + attention 3.184 ms) = "
              f"{total * 1e3:.1f} ms   (measured trunk: see profile_fine)")


if __name__ == "__main__":
    main()
