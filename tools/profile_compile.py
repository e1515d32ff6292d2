"""Cold/warm compile-time accounting per engine mode bucket.

The tiled engine compiles ONE XLA program per (mode, n_random) bucket; on a
fresh machine that cost lands on the first inference (BENCH r02 recorded
544 s for the p49 bucket). This tool measures, per bucket:

  * cold   — trace + XLA compile with the persistent cache disabled
  * warm   — same program restored through the persistent cache
             (JAX_COMPILATION_CACHE_DIR, the deployment path)

and the program body count (each distinct chunk shape inside `_chunked`
compiles its own copy of the fine+fusion stack — the greedy 49 = 3x16 + 1
split carries a second, remainder-sized body; `--chunk-policy divisor`
trades ~9% runtime for a single body).

Usage: python tools/profile_compile.py [--core vitl] [--modes m1,m2]
       [--process-num 16] [--no-cold]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--core", default="vitl")
    ap.add_argument("--modes", default="m1,m2")
    ap.add_argument("--process-num", type=int, default=16)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--no-cold", action="store_true",
                    help="only measure the warm (cached) path")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE_DIR)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from patchfusion_tpu.engine.inference import PatchFusionInference
    from patchfusion_tpu.models.builder import build_patchfusion

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    sizes = [(14, 19), (28, 37), (56, 74), (112, 148), (224, 296),
             (392, 518)]
    c = {"vits": 64, "vitb": 128, "vitl": 256}[args.core]
    zoe = dict(type="DA-ZoeDepth", midas_model_type=args.core,
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
    shapes = jax.eval_shape(
        net.init, jax.random.PRNGKey(0), jnp.zeros((1, 392, 518, 3)),
        jnp.zeros((1, 392, 518, 3)), jnp.asarray([[0., 0., 960., 540.]]))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    if "batch_stats" in variables:
        variables["batch_stats"] = jax.tree.map(
            jnp.ones_like, variables["batch_stats"])
    if dtype == jnp.bfloat16:
        variables["params"] = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, variables["params"])

    engine = PatchFusionInference(net, variables, tile_cfg,
                                  process_num=args.process_num)
    img = jnp.zeros((2160, 3840, 3), jnp.float32)
    lr = jnp.zeros((1, 392, 518, 3), jnp.float32)
    rand = jnp.zeros((0, 2), jnp.int32)

    for mode in args.modes.split(","):
        n_random = int(mode[1:]) if mode.startswith("r") else 0
        m = "r" if mode.startswith("r") else mode
        fn = engine._build(m, n_random)
        lowered = fn.lower(variables, lr, img, rand)
        results = {}
        if not args.no_cold:
            jax.config.update("jax_enable_compilation_cache", False)
            t0 = time.time()
            lowered.compile()
            results["cold"] = time.time() - t0
            jax.config.update("jax_enable_compilation_cache", True)
        t0 = time.time()
        compiled = lowered.compile()
        results["warm"] = time.time() - t0
        n = sum(len(oh) * len(ow)
                for (oh, ow) in engine._mode_plan(m)[1])
        pn = args.process_num
        bodies = (1 if n % pn == 0 or pn >= n else 2) \
            + (1 if mode.startswith("r") else 0)
        cold = f"{results['cold']:8.1f}s" if "cold" in results else "    (skip)"
        print(f"{mode:>5s}: cold {cold}  warm {results['warm']:6.1f}s  "
              f"tile bodies {bodies}  "
              f"(tiles {n} @ chunk {pn})", flush=True)


if __name__ == "__main__":
    main()
