"""Train-step throughput on the current backend (reference recipe shapes).

The reference trains PatchFusion with batch 4/GPU at 392x518 crops
(configs/_base_/datasets/u4k.py:4, docs/user_training.md). This times ONE
jitted SPMD train step (frozen branches fwd + fusion fwd/bwd + AdamW) on
the real chip with honest fences and reports step/s + XLA-counted
TFLOP/s.

Usage: python tools/profile_train.py [--batch 4] [--core vitl]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--core", default="vitl")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--amp", action="store_true",
                    help="bf16 compute + bf16 frozen-branch storage, f32 "
                         "masters (the tools/train.py --amp mode)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from patchfusion_tpu.models.builder import build_patchfusion
    from patchfusion_tpu.engine.training import (create_train_state,
                                                 make_onecycle_optimizer,
                                                 make_train_step)

    core = args.core
    b = args.batch
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
    if args.remat:
        config["train_remat"] = True
    net, _ = build_patchfusion(
        config, dtype=jnp.bfloat16 if args.amp else jnp.float32)

    rng = jax.random.PRNGKey(0)
    image_lr = jnp.zeros((1, 392, 518, 3), jnp.float32)
    crops1 = jnp.zeros((1, 392, 518, 3), jnp.float32)
    bboxs1 = jnp.asarray([[0., 0., 960., 540.]], jnp.float32)
    shapes = jax.eval_shape(net.init, rng, image_lr, crops1, bboxs1)
    variables = jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype)
        if s.dtype == jnp.float32 else jnp.zeros(s.shape, s.dtype), shapes)
    if "batch_stats" in variables:
        variables["batch_stats"] = jax.tree.map(
            jnp.ones_like, variables["batch_stats"])

    tx = make_onecycle_optimizer(max_lr=4e-5, total_steps=1000)
    state = create_train_state(variables["params"],
                               variables.get("batch_stats", {}), tx,
                               frozen_dtype=jnp.bfloat16 if args.amp
                               else None)
    # donate the state: without it the old and new params/opt-state
    # coexist at the step boundary (~3 GB at vitl f32)
    step = jax.jit(make_train_step(net, tx), donate_argnums=(0,))

    npr = np.random.default_rng(0)
    batch = {
        "image_lr": jax.device_put(
            npr.random((b, 392, 518, 3), np.float32)),
        "crops_image_hr": jax.device_put(
            npr.random((b, 392, 518, 3), np.float32)),
        "crop_depths": jax.device_put(
            (npr.random((b, 392, 518, 1)) * 20 + 1).astype(np.float32)),
        "bboxs": jax.device_put(np.tile(
            np.array([[100., 100., 1060., 640.]], np.float32), (b, 1))),
    }

    low = step.lower(state, batch).compile()
    ca = low.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    fl = float(ca.get("flops", float("nan")))
    # compile-time HBM accounting — the only memory number available through
    # the axon tunnel (device.memory_stats() returns None there)
    try:
        ma = low.memory_analysis()
        if ma is not None:
            total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                     + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
            print(f"memory analysis: args {ma.argument_size_in_bytes / 2**30:.2f}"
                  f" + out {ma.output_size_in_bytes / 2**30:.2f}"
                  f" + temp {ma.temp_size_in_bytes / 2**30:.2f}"
                  f" - aliased {ma.alias_size_in_bytes / 2**30:.2f}"
                  f" = {total / 2**30:.2f} GiB", file=sys.stderr)
    except Exception as e:
        print(f"memory analysis unavailable: {e}", file=sys.stderr)

    t0 = time.time()
    state, logs = step(state, batch)
    print(f"loss={float(logs['total_loss']):.4f} "
          f"(first step {time.time() - t0:.1f}s)", file=sys.stderr)
    times = []
    for _ in range(args.iters):
        t0 = time.time()
        state, logs = step(state, batch)
        _ = float(logs["total_loss"])  # honest fence (host readback)
        times.append(time.time() - t0)
    dt = float(np.median(times))
    stats = jax.devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    tag = f"b{b} {core}{' remat' if args.remat else ''}" \
          f"{' amp' if args.amp else ''}"
    print(f"train step ({tag}): {dt * 1e3:.0f} ms = {1 / dt:.2f} "
          f"step/s = {b / dt:.2f} crops/s  {fl / 1e12:.1f} TFLOP "
          f"-> {fl / dt / 1e12:.1f} TFLOP/s"
          + (f"  peak HBM {peak / 2**30:.1f} GiB" if peak else ""))


if __name__ == "__main__":
    main()
