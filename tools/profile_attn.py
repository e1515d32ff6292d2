"""Attention-implementation shootout at the fine-branch shapes.

Benches the bf16 einsum path (models/dinov2.fused_attention), the
whole-row VMEM Pallas kernel, and the row-blocked Pallas kernel at a
sweep of block sizes, all at (B, N, H, Dh) = (16, 1037, 16, 64) vitl
tile-chunk shapes. In-jit scan timer (tunnel-safe).

Usage: python tools/profile_attn.py [--batch 16] [--n 1037]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n", type=int, default=1037)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dh", type=int, default=64)
    ap.add_argument("--inner", type=int, default=20)
    ap.add_argument("--blocks", default="1152,576,384,288,192,128")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tools._bench_util import device_time
    from patchfusion_tpu.models.dinov2 import fused_attention
    from patchfusion_tpu.ops.pallas_attention import (vit_attention,
                                                      vit_attention_blocked)

    rng = np.random.default_rng(0)
    shape = (args.batch, args.n, args.heads, args.dh)
    q, k, v = (jax.device_put(rng.standard_normal(shape, np.float32)
                              .astype(jnp.bfloat16)) for _ in range(3))
    flops = 2 * 2 * args.batch * args.heads * args.n * args.n * args.dh

    ref = np.asarray(fused_attention(q, k, v), np.float32)

    def row(name, fn):
        try:
            got = np.asarray(fn(q, k, v), np.float32)
            err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-9)
            t = device_time(fn, (q, k, v), inner=args.inner)
            print(f"{name:24s} {t * 1e3:7.3f} ms  {flops / t / 1e12:6.1f}"
                  f" TF/s  rel-err {err:.2e}", flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}", flush=True)

    row("einsum (bf16 probs)", fused_attention)
    row("pallas whole-row", vit_attention)
    npad = ((args.n + 127) // 128) * 128
    for br in (int(s) for s in args.blocks.split(",")):
        if npad % br == 0:
            row(f"pallas blocked[{br}]",
                lambda a, b_, c, br=br: vit_attention_blocked(a, b_, c, br))

    from patchfusion_tpu.ops.pallas_attention import vit_attention_mxsum
    row("pallas mxsum", vit_attention_mxsum)
    row("pallas mxsum bf16exp",
        lambda a, b_, c: vit_attention_mxsum(a, b_, c, bf16_exp=True))


if __name__ == "__main__":
    main()
