"""Throughput benchmark: 4K images/sec/chip for PatchFusion tiled inference.

Target metric (BASELINE.json): DA-vitl, p49 (= cai_mode m2 on a 4x4 split) on
2160x3840 input. The reference publishes no numbers (SURVEY §6); the
`vs_baseline` ratio is against A100_P49_IMG_PER_S below — our working
estimate of the PyTorch reference's A100 throughput for the same config
(49 ZoeDepth-vitl tile passes + 1 coarse pass per image; the reference
README:61 states inference time is linear in base-model time).

Env overrides: BENCH_CORE (vitl|vitb|vits|beit — beit selects the
ZoeDepth/MiDaS DPT_BEiT_L_384 variant at 384x512), BENCH_MODE (m1|m2|rN),
BENCH_DTYPE (bf16|f32), BENCH_ITERS, BENCH_PROCESS_NUM.
"""

import json
import os
import sys
import time

import numpy as np

# persistent XLA compilation cache: repeated bench runs (and the driver's
# end-of-round run) deserialize the engine executables instead of paying
# the multi-minute XLA compile. NOTE: env vars here would be too late —
# sitecustomize already imported jax — so the cache is enabled via
# jax.config.update at patchfusion_tpu import (utils/cache.py; the
# round-2..4 "tunnel can't cache" caveat was exactly this late-env bug).

# A100 80GB PyTorch 2.1 estimate for DA-vitl p49 4K inference, img/s.
# FLOPs-grounded (see BASELINE.md "A100 baseline derivation"): XLA cost
# analysis counts 198.0 TFLOP per p49 4K image (1.39T coarse+G2L +
# 49 x 4.02T fine+fusion tiles); 0.33 img/s corresponds to the reference
# eager-PyTorch pipeline sustaining 65 TFLOP/s = 21% MFU of A100 fp16 peak
# (312 TFLOP/s) — a realistic rate for its per-tile Python loops,
# process_num=2 micro-batches, and unfused interpolate/attention mix.
# Kept fixed across rounds so the ratio is comparable.
A100_P49_IMG_PER_S = 0.33

# BENCH_MESH=patch: instead of the TPU throughput bench, run the
# patch-sharded engine on an 8-device virtual CPU mesh and assert parity
# with the single-device engine (continuous evidence for the ICI tile
# sharding claim). Must configure the platform BEFORE jax imports.
if os.environ.get("BENCH_MESH") == "patch":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    _f = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in _f:
        os.environ["XLA_FLAGS"] = (
            _f + " --xla_force_host_platform_device_count=8").strip()


def main_mesh_parity():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import __graft_entry__ as graft
    from patchfusion_tpu.engine.inference import PatchFusionInference
    from patchfusion_tpu.models.builder import build_patchfusion

    config = graft._tiny_config()
    net, tile_cfg = build_patchfusion(config)
    variables = graft._shape_init(
        net, jnp.zeros((1, 42, 56, 3)), jnp.zeros((1, 42, 56, 3)),
        jnp.asarray([[0., 0., 56., 42.]]))
    # seeded random params (constant fills would hide permutation bugs)
    leaves, treedef = jax.tree.flatten(variables["params"])
    key = jax.random.PRNGKey(0)
    leaves = [0.05 * jax.random.normal(jax.random.fold_in(key, i), l.shape,
                                       l.dtype)
              if l.dtype in (jnp.float32, jnp.bfloat16) else l
              for i, l in enumerate(leaves)]
    variables["params"] = jax.tree.unflatten(treedef, leaves)

    rng = np.random.default_rng(0)
    image_hr = jnp.asarray(rng.random((84, 112, 3), np.float32))
    image_lr = jax.image.resize(image_hr, (42, 56, 3), "linear")[None]

    single = PatchFusionInference(net, variables, tile_cfg, process_num=2)
    d_single = np.asarray(single.infer(image_lr, image_hr, cai_mode="m2"))

    mesh = Mesh(np.array(jax.devices()[:8]), ("patch",))
    sharded = PatchFusionInference(net, variables, tile_cfg, mesh=mesh)
    d_sharded = np.asarray(sharded.infer(image_lr, image_hr, cai_mode="m2"))

    diff = float(np.max(np.abs(d_single - d_sharded)))
    ok = diff < 2e-4
    print(json.dumps({
        "metric": "p49 patch-sharded parity (8-device virtual mesh)",
        "value": diff, "unit": "max_abs_diff",
        "vs_baseline": 1.0 if ok else 0.0}))
    if not ok:
        raise SystemExit(1)


def main():
    import jax
    import jax.numpy as jnp

    from patchfusion_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    core = os.environ.get("BENCH_CORE", "vitl")
    mode = os.environ.get("BENCH_MODE", "m2")
    dtype_s = os.environ.get("BENCH_DTYPE", "bf16")
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    # whole-pass batches (process_num=None) have no padding waste but
    # vitl/vitb at batch 49 exceed v5e HBM; 16-tile chunks are the measured
    # vitl sweet spot (42.7 ms/tile vs 46.7 at 8, 50.2 at 12) and fit since
    # ROI pyramids became chunk-local
    default_pn = "0" if os.environ.get("BENCH_CORE", "vitl") == "vits" \
        else "16"
    process_num = int(os.environ.get("BENCH_PROCESS_NUM", default_pn)) \
        or None
    dtype = jnp.bfloat16 if dtype_s == "bf16" else jnp.float32

    from patchfusion_tpu.models.builder import build_patchfusion
    from patchfusion_tpu.engine.inference import PatchFusionInference

    if core == "beit":
        # the ZoeDepth (MiDaS DPT_BEiT_L_384) variant, reference
        # configs/patchfusion_zoedepth/zoedepth_patchfusion_u4k.py
        proc = (384, 512)
        zoe = dict(type="ZoeDepth", midas_model_type="DPT_BEiT_L_384",
                   img_size=list(proc), n_bins=64,
                   bin_centers_type="softplus", bin_embedding_dim=128,
                   n_attractors=[16, 8, 4, 1], attractor_alpha=1000,
                   attractor_gamma=2, attractor_kind="mean",
                   attractor_type="inv", min_temp=0.0212, max_temp=50.0)
        fusion_in = [32, 256, 256, 256, 256, 256]
        # BEiT patch 16: grid 24x32, pyramid = half-grid .. full res
        # (reference zoedepth_patchfusion_u4k.py num_patches)
        sizes = [(12, 16), (24, 32), (48, 64), (96, 128), (192, 256),
                 (384, 512)]
    else:
        proc = (392, 518)
        c = {"vits": 64, "vitb": 128, "vitl": 256}[core]
        zoe = dict(type="DA-ZoeDepth", midas_model_type=core,
                   img_size=list(proc), n_bins=64,
                   bin_centers_type="softplus", bin_embedding_dim=128,
                   n_attractors=[16, 8, 4, 1], attractor_alpha=1000,
                   attractor_gamma=2, attractor_kind="mean",
                   attractor_type="inv", min_temp=0.0212, max_temp=50.0)
        fusion_in = [32, c, c, c, c, c]
        # DINOv2 patch 14: grid 28x37, pyramid = half-grid .. full res
        sizes = [(14, 19), (28, 37), (56, 74), (112, 148), (224, 296),
                 (392, 518)]
    config = dict(
        image_raw_shape=(2160, 3840), patch_split_num=(4, 4),
        patch_process_shape=proc, min_depth=1e-3, max_depth=80,
        coarse_branch=zoe, fine_branch=zoe,
        guided_fusion=dict(type="GuidedFusionPatchFusion",
                           patch_process_shape=proc,
                           in_channels=fusion_in,
                           num_patches=[h * w for (h, w) in sizes[::-1]],
                           n_channels=5, g2l=True),
        sigloss=dict(type="SILogLoss"))

    net, tile_cfg = build_patchfusion(config, dtype=dtype)

    rng = jax.random.PRNGKey(0)
    image_lr = jnp.zeros((1, 392, 518, 3), jnp.float32)
    crops = jnp.zeros((1, 392, 518, 3), jnp.float32)
    bboxs = jnp.asarray([[0., 0., 960., 540.]], jnp.float32)
    t0 = time.time()
    # abstract init: throughput doesn't depend on weight values, and a real
    # net.init would compile the whole forward just to produce shapes
    shapes = jax.eval_shape(net.init, rng, image_lr, crops, bboxs)
    key = jax.random.PRNGKey(0)

    def make(s):
        if s.dtype == jnp.float32:
            return jnp.full(s.shape, 0.01, s.dtype)
        return jnp.zeros(s.shape, s.dtype)

    variables = jax.tree.map(make, shapes)
    # batch-norm vars must be positive
    if "batch_stats" in variables:
        variables["batch_stats"] = jax.tree.map(
            lambda x: jnp.ones_like(x), variables["batch_stats"])
    if dtype == jnp.bfloat16:
        # store params in bf16 too: the modules compute in bf16 anyway and
        # f32 master copies of the frozen branches waste ~1.5 GB HBM (vitl)
        variables["params"] = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, variables["params"])
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    engine = PatchFusionInference(net, variables, tile_cfg,
                                  process_num=process_num)

    img = jax.device_put(jnp.asarray(
        np.random.default_rng(0).random((2160, 3840, 3), np.float32)))
    lr = jax.device_put(jax.image.resize(img, (392, 518, 3), "linear")[None])
    cache_dir = os.environ["JAX_COMPILATION_CACHE_DIR"]
    cache_before = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) \
        else 0
    t0 = time.time()
    d = engine.infer(lr, img, cai_mode=mode)
    # fence by host readback of a value depending on the whole output:
    # through the remote-TPU tunnel block_until_ready can return before
    # execution finishes, silently inflating throughput
    float(d.mean())
    compile_s = time.time() - t0
    cache_after = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) \
        else 0
    # cache_new_entries is diagnostic: >0 means this run compiled and
    # persisted executables (cold), 0 means everything deserialized from
    # the cache (warm). compile_first_s is the honest user-facing number
    # either way (warm = backend init + deserialize + first image).
    new_entries = cache_after - cache_before
    print(f"compile+first: {compile_s:.1f}s "
          f"({new_entries} new cache entries)", file=sys.stderr,
          flush=True)

    # latency: fence every image (includes the host round trip)
    times = []
    for _ in range(iters):
        t0 = time.time()
        d = engine.infer(lr, img, cai_mode=mode)
        float(d.mean())
        times.append(time.time() - t0)
    lat = float(np.median(times))
    print(f"per-image latency: {lat * 1e3:.0f} ms", file=sys.stderr,
          flush=True)
    # throughput (the reported metric): keep the pipeline fed — dispatch
    # all iterations asynchronously, fence once at the end. Device compute
    # is serial on one chip; this only hides the per-image host RTT, which
    # a production serving loop would also hide.
    t0 = time.time()
    outs = [engine.infer(lr, img, cai_mode=mode) for _ in range(iters)]
    for d in outs:
        float(d.mean())
    dt = (time.time() - t0) / iters
    img_per_s = 1.0 / dt
    paper_mode = {"m1": "p16", "m2": "p49"}.get(mode, mode)
    print(json.dumps({
        "metric": f"4K images/sec/chip (DA-{core}, {paper_mode}, "
                  f"{dtype_s})",
        "value": round(img_per_s, 4),
        "unit": "img/s",
        "vs_baseline": round(img_per_s / A100_P49_IMG_PER_S, 3),
        "latency_ms": round(lat * 1e3, 1),
        "compile_first_s": round(compile_s, 1),
        "cache_new_entries": new_entries,
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH_MESH") == "patch":
        main_mesh_parity()
    else:
        main()
