"""Stage-level profile of the tiled-inference pipeline on the current
backend: times + XLA-reported FLOPs + MFU for (a) the coarse pass (ZoeDepth
whole-image + G2L attention) and (b) one fine+fusion tile chunk. The numbers
recorded in BASELINE.md come from running this on the real v5e chip.

Usage: python tools/profile_infer.py [--core vitl] [--chunk 8] [--dtype bf16]
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

PEAK_TFLOPS = {"tpu": 197.0,   # v5e bf16
               "cpu": None}


def _fetch(out):
    """Force completion by pulling a scalar to the host: through the remote
    (axon) tunnel block_until_ready returns early, so device->host readback
    of a value that depends on the whole output is the only reliable fence."""
    import jax
    leaf = jax.tree.leaves(out)[0]
    return float(leaf.sum() if hasattr(leaf, "sum") else leaf)


def timed(fn, args, iters=10):
    _fetch(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        _fetch(fn(*args))
    return (time.time() - t0) / iters


def flops_of(lowered_compiled):
    ca = lowered_compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--core", default="vitl")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from patchfusion_tpu.models.builder import build_patchfusion
    from patchfusion_tpu.models.patchfusion import PatchFusionNet

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    core = args.core
    sizes = [(14, 19), (28, 37), (56, 74), (112, 148), (224, 296),
             (392, 518)]
    c = {"vits": 64, "vitb": 128, "vitl": 256}[core]
    zoe = dict(type="DA-ZoeDepth", midas_model_type=core,
               img_size=[392, 518], n_bins=64, bin_centers_type="softplus",
               bin_embedding_dim=128, n_attractors=[16, 8, 4, 1],
               attractor_alpha=1000, attractor_gamma=2,
               attractor_kind="mean", attractor_type="inv",
               min_temp=0.0212, max_temp=50.0)
    config = dict(
        image_raw_shape=(2160, 3840), patch_split_num=(4, 4),
        patch_process_shape=(392, 518), min_depth=1e-3, max_depth=80,
        coarse_branch=zoe, fine_branch=zoe,
        guided_fusion=dict(type="GuidedFusionPatchFusion",
                           patch_process_shape=(392, 518),
                           in_channels=[32, c, c, c, c, c],
                           num_patches=[h * w for (h, w) in sizes[::-1]],
                           n_channels=5, g2l=True),
        sigloss=dict(type="SILogLoss"))
    net, tile_cfg = build_patchfusion(config, dtype=dtype)

    rng = jax.random.PRNGKey(0)
    image_lr = jnp.zeros((1, 392, 518, 3), jnp.float32)
    crops1 = jnp.zeros((1, 392, 518, 3), jnp.float32)
    bboxs = jnp.asarray([[0., 0., 960., 540.]], jnp.float32)
    shapes = jax.eval_shape(net.init, rng, image_lr, crops1, bboxs)

    def make(s):
        if s.dtype == jnp.float32:
            return jnp.full(s.shape, 0.01, s.dtype)
        return jnp.zeros(s.shape, s.dtype)
    variables = jax.tree.map(make, shapes)
    if "batch_stats" in variables:
        variables["batch_stats"] = jax.tree.map(
            jnp.ones_like, variables["batch_stats"])
    if dtype == jnp.bfloat16:
        variables["params"] = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, variables["params"])

    backend = jax.default_backend()
    peak = PEAK_TFLOPS.get(backend)

    # -- stage A: coarse pass (whole-image ZoeDepth + G2L attention) --------
    def coarse_fn(variables, image_lr):
        cd, cf = net.apply(variables, image_lr,
                           method=PatchFusionNet.coarse_forward)
        g2l = net.apply(variables, cf, method=PatchFusionNet.attend_coarse)
        return cd, cf, g2l

    img_lr = jax.device_put(np.random.default_rng(0).random(
        (1, 392, 518, 3), np.float32))
    cj = jax.jit(coarse_fn)
    low = cj.lower(variables, img_lr).compile()
    t = timed(cj, (variables, img_lr), args.iters)
    fl = flops_of(low)
    print(f"coarse+g2l: {t * 1e3:8.2f} ms  {fl / 1e9:8.1f} GFLOP  "
          f"{fl / t / 1e12:6.1f} TFLOP/s"
          + (f"  MFU {fl / t / 1e12 / peak * 100:5.1f}%" if peak else ""))

    # -- stage B: one fine+fusion chunk --------------------------------------
    n = args.chunk
    cd, cf, g2l = cj(variables, img_lr)
    crops = jax.device_put(np.random.default_rng(1).random(
        (n, 392, 518, 3), np.float32))
    droi = jnp.broadcast_to(cd, (n,) + cd.shape[1:])
    frois = [jnp.broadcast_to(f, (n,) + f.shape[1:]) for f in cf]
    grois = [jnp.broadcast_to(f, (n,) + f.shape[1:]) for f in g2l]

    def chunk_fn(variables, crops, droi, frois, grois):
        d = net.apply(variables, crops, frois, grois, droi,
                      method=PatchFusionNet.infer_tiles)
        return d

    kj = jax.jit(chunk_fn)
    low = kj.lower(variables, crops, droi, frois, grois).compile()
    t = timed(kj, (variables, crops, droi, frois, grois), args.iters)
    fl = flops_of(low)
    print(f"chunk[{n}]:  {t * 1e3:8.2f} ms  {fl / 1e9:8.1f} GFLOP  "
          f"{fl / t / 1e12:6.1f} TFLOP/s"
          + (f"  MFU {fl / t / 1e12 / peak * 100:5.1f}%" if peak else ""))
    print(f"per tile:   {t / n * 1e3:8.2f} ms  {fl / n / 1e9:8.1f} GFLOP")

    # -- fine-only vs fusion-only split --------------------------------------
    def fine_fn(variables, crops):
        return net.apply(variables, crops, method=PatchFusionNet.fine_forward)

    fj = jax.jit(fine_fn)
    low = fj.lower(variables, crops).compile()
    t = timed(fj, (variables, crops), args.iters)
    fl = flops_of(low)
    print(f"fine[{n}]:   {t * 1e3:8.2f} ms  {fl / 1e9:8.1f} GFLOP  "
          f"{fl / t / 1e12:6.1f} TFLOP/s"
          + (f"  MFU {fl / t / 1e12 / peak * 100:5.1f}%" if peak else ""))

    # p49 projection: coarse + 49 tiles in chunks
    tc = timed(cj, (variables, img_lr), args.iters)
    tk = timed(kj, (variables, crops, droi, frois, grois), args.iters)
    import math
    total = tc + math.ceil(49 / n) * tk
    print(f"p49 projection: {total * 1e3:.0f} ms/img = "
          f"{1 / total:.3f} img/s (coarse {tc * 1e3:.0f} + "
          f"{math.ceil(49 / n)} x chunk {tk * 1e3:.0f})")


if __name__ == "__main__":
    main()
