"""CLB-stage-only microbenchmark: params_pt_lowres + fused pallas kernel
at the exact fine-branch shapes (B=16, 392x518, cond 224x296x128, 64 bins).

Small program (no ViT/decoder) so the remote-compile helper is not at risk.
Usage: python tools/profile_clb.py [--batch 16]
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
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--ptrows", type=int, default=0,
                    help="block_rows override for the clb_pt kernel")
    ap.add_argument("--only-fused", action="store_true")
    ap.add_argument("--deep", action="store_true",
                    help="also attempt the EXPERIMENTAL-FROZEN deep kernel "
                         "(its Mosaic compile SIGKILLs the remote helper "
                         "on this environment)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tools._bench_util import device_time
    from patchfusion_tpu.models.zoedepth import ConditionalLogBinomial
    from patchfusion_tpu.ops.pallas_head import (logbinomial_depth,
                                                 pick_block_rows)

    b, h, w = args.batch, 392, 518
    ih, iw = 224, 296
    rng = np.random.default_rng(0)

    def mk(shape, d=jnp.bfloat16):
        return jax.device_put(
            rng.standard_normal(shape, np.float32).astype(
                np.dtype(jnp.dtype(d).name)))

    last_cat = mk((b, h, w, 33))
    cond_lo = mk((b, ih, iw, 128))
    b_centers = jnp.abs(mk((b, ih, iw, 64))) + 0.01
    clb = ConditionalLogBinomial(33, 128, 64, 0.0212, 50.0,
                                 dtype=jnp.bfloat16)
    v = clb.init(jax.random.PRNGKey(0), last_cat[:1, :8, :8],
                 mk((1, 8, 8, 128)))
    v = jax.tree.map(lambda t: (t.astype(jnp.bfloat16)
                                if t.dtype == jnp.float32 else t), v)
    br = pick_block_rows(h)

    def pre_only(lc, cl):
        return clb.apply(v, lc, cl,
                         method=ConditionalLogBinomial.params_pt_lowres)

    def full(lc, cl, bc):
        p, tn = clb.apply(v, lc, cl,
                          method=ConditionalLogBinomial.params_pt_lowres)
        return logbinomial_depth(p, tn, bc, 0.0212, 50.0, block_rows=br)

    def kernel_only(p, tn, bc):
        return logbinomial_depth(p, tn, bc, 0.0212, 50.0, block_rows=br)

    p0, t0 = jax.jit(pre_only)(last_cat, cond_lo)
    p0, t0 = jax.device_put(p0), jax.device_put(t0)

    if not args.only_fused:
        t = device_time(pre_only, (last_cat, cond_lo), inner=args.inner)
        print(f"clb pre (proj+gelu+mlp2) {t * 1e3:7.3f} ms", flush=True)
        t = device_time(kernel_only, (p0, t0, b_centers), inner=args.inner)
        print(f"pallas logbinom kernel   {t * 1e3:7.3f} ms", flush=True)
        t = device_time(full, (last_cat, cond_lo, b_centers),
                        inner=args.inner)
        print(f"clb full stage           {t * 1e3:7.3f} ms", flush=True)

    # fused (p, t) parameter kernel + the logbinom kernel (the new default
    # bf16 head path)
    from patchfusion_tpu.ops.pallas_head import clb_pt
    w1 = v["params"]["mlp_0"]["kernel"][0, 0]
    b1 = v["params"]["mlp_0"]["bias"]
    w2 = v["params"]["mlp_2"]["kernel"][0, 0]
    b2 = v["params"]["mlp_2"]["bias"]

    ptr = args.ptrows or br

    def pt_fused(lc, cl):
        return clb_pt(lc, cl, w1, b1, w2, b2, 1e-4, ptr)

    def full_fused(lc, cl, bc):
        p, tn = clb_pt(lc, cl, w1, b1, w2, b2, 1e-4, ptr)
        return logbinomial_depth(p, tn, bc, 0.0212, 50.0, block_rows=br)

    pr, tr_ = jax.jit(pre_only)(last_cat, cond_lo)
    pg, tg = jax.jit(pt_fused)(last_cat, cond_lo)
    perr = float(np.max(np.abs(np.asarray(pg) - np.asarray(pr))))
    terr = float(np.max(np.abs(np.asarray(tg) - np.asarray(tr_))))
    t = device_time(pt_fused, (last_cat, cond_lo), inner=args.inner)
    print(f"clb_pt FUSED kernel      {t * 1e3:7.3f} ms  "
          f"p-err {perr:.2e} t-err {terr:.2e}", flush=True)
    t = device_time(full_fused, (last_cat, cond_lo, b_centers),
                    inner=args.inner)
    print(f"clb full (pt+logbinom)   {t * 1e3:7.3f} ms", flush=True)

    if not args.deep:
        return

    # deep-fused single kernel (EXPERIMENTAL-FROZEN, --deep only)
    from patchfusion_tpu.ops.pallas_head import clb_logbinomial_depth
    w1 = v["params"]["mlp_0"]["kernel"][0, 0]
    b1 = v["params"]["mlp_0"]["bias"]
    w2 = v["params"]["mlp_2"]["kernel"][0, 0]
    b2 = v["params"]["mlp_2"]["bias"]

    def fused(lc, cl, bc):
        return clb_logbinomial_depth(lc, cl, bc, w1, b1, w2, b2,
                                     0.0212, 50.0, 1e-4, br)

    ref = np.asarray(jax.jit(full)(last_cat, cond_lo, b_centers))
    got = np.asarray(jax.jit(fused)(last_cat, cond_lo, b_centers))
    err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-9)
    t = device_time(fused, (last_cat, cond_lo, b_centers), inner=args.inner)
    print(f"clb DEEP-FUSED kernel    {t * 1e3:7.3f} ms  rel-err {err:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
