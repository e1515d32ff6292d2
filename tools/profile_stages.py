"""Fine-branch stage breakdown on the current backend (honest fences).

Times, XLA-counted FLOPs and MFU for: the DINOv2 trunk alone, trunk+DPT
head, the full fine ZoeDepth branch, and a batch-size sweep — the data
behind the BASELINE.md "where the fine-branch MFU goes" table.

Usage: python tools/profile_stages.py [--core vitl] [--batches 4,8,12,16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np

PEAK_TFLOPS = {"tpu": 197.0, "cpu": None}


def _fetch(out):
    import jax
    leaf = jax.tree.leaves(out)[0]
    return float(leaf.sum() if hasattr(leaf, "sum") else leaf)


def timed(fn, args, iters=10):
    _fetch(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        _fetch(fn(*args))
    return (time.time() - t0) / iters


def flops_of(c):
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def report(name, fn, variables, x, iters, peak):
    import jax
    j = jax.jit(fn)
    low = j.lower(variables, x).compile()
    t = timed(j, (variables, x), iters)
    fl = flops_of(low)
    print(f"{name:24s} {t * 1e3:8.2f} ms  {fl / 1e9:8.1f} GFLOP  "
          f"{fl / t / 1e12:6.1f} TFLOP/s"
          + (f"  MFU {fl / t / 1e12 / peak * 100:5.1f}%" if peak else ""),
          flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--core", default="vitl")
    ap.add_argument("--batches", default="8")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from patchfusion_tpu.models.dinov2 import DinoViT, VIT_CONFIGS
    from patchfusion_tpu.models.dpt import DPTDinov2
    from patchfusion_tpu.models.zoedepth import ZoeDepthDA

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    peak = PEAK_TFLOPS.get(jax.default_backend())
    h, w = 392, 518

    def init_bf16(net, x):
        shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), x)

        def make(s):
            v = jnp.full(s.shape, 0.01, s.dtype)
            return v
        variables = jax.tree.map(make, shapes)
        if dtype == jnp.bfloat16:
            variables["params"] = jax.tree.map(
                lambda t: t.astype(jnp.bfloat16)
                if t.dtype == jnp.float32 else t, variables["params"])
        return variables

    for b in [int(s) for s in args.batches.split(",")]:
        print(f"== batch {b} ==", flush=True)
        x = jax.device_put(np.random.default_rng(0).random(
            (b, h, w, 3), np.float32))

        vit = DinoViT(**VIT_CONFIGS[args.core], dtype=dtype)
        v_vit = init_bf16(vit, x)
        t_vit = report("vit trunk", lambda v, y: vit.apply(v, y),
                       v_vit, x, args.iters, peak)

        dpt = DPTDinov2(args.core, dtype=dtype)
        v_dpt = init_bf16(dpt, x)
        t_dpt = report("vit+dpt", lambda v, y: dpt.apply(v, y),
                       v_dpt, x, args.iters, peak)

        zoe = ZoeDepthDA(core_type=args.core, dtype=dtype)
        v_zoe = init_bf16(zoe, x)
        t_zoe = report("fine zoe branch",
                       lambda v, y: zoe.apply(v, y)["metric_depth"],
                       v_zoe, x, args.iters, peak)
        print(f"  -> dpt-head part {1e3 * (t_dpt - t_vit):7.2f} ms, "
              f"bins-head part {1e3 * (t_zoe - t_dpt):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
