"""Fine-branch micro-breakdown with the in-jit scan timer (tunnel-safe).

Times the DINOv2 trunk, the DPT decoder split into its three stages
(reassemble, refinenet chain, output stage), and the metric-bins head —
each at its exact in-model shapes — to locate the fine branch's low-MFU
components (BASELINE.md round-3: decoder+head ~117 ms/16 tiles = 17% MFU).

Usage: python tools/profile_fine.py [--core vitl] [--batch 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np

PEAK = 197.0  # v5e bf16 TFLOP/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--core", default="vitl")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--stages", default="all",
                    help="comma list: vit,dpt,zoe,head,reassemble,"
                         "refinenets,output (default all)")
    args = ap.parse_args()
    want = (None if args.stages == "all"
            else set(args.stages.split(",")))

    def on(name):
        return want is None or name in want

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from tools._bench_util import device_time
    from patchfusion_tpu.models.dinov2 import DinoViT, VIT_CONFIGS
    from patchfusion_tpu.models.dpt import (DPT_CONFIGS, DPTDinov2, DPTHead,
                                            FeatureFusionBlock)
    from patchfusion_tpu.models.zoedepth import ZoeDepthDA
    from patchfusion_tpu.ops.resize import interpolate

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    peak = PEAK if jax.default_backend() == "tpu" else None
    b = args.batch
    h, w = 392, 518
    ph, pw = h // 14, w // 14
    dcfg = DPT_CONFIGS[args.core]
    feat = dcfg["features"]
    oc = dcfg["out_channels"]
    embed = VIT_CONFIGS[args.core]["embed_dim"]
    rng = np.random.default_rng(0)

    def mk(shape, d=None):
        return jax.device_put(
            rng.standard_normal(shape, np.float32).astype(
                np.dtype(jnp.dtype(d or dtype).name)))

    def init_cast(net, *xs, init_fn=None):
        init = init_fn or net.init
        shapes = jax.eval_shape(init, jax.random.PRNGKey(0), *xs)
        variables = jax.tree.map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
        if dtype == jnp.bfloat16:
            variables["params"] = jax.tree.map(
                lambda t: t.astype(jnp.bfloat16)
                if t.dtype == jnp.float32 else t, variables["params"])
        return variables

    def row(name, fn, first, *rest):
        t = device_time(fn, (first, *rest), inner=args.inner)
        try:
            c = jax.jit(fn).lower(first, *rest).compile()
            ca = c.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            fl = float(ca.get("flops", float("nan")))
        except Exception:
            fl = float("nan")
        mfu = f"  MFU {fl / t / 1e12 / peak * 100:5.1f}%" if peak else ""
        print(f"{name:26s} {t * 1e3:8.2f} ms  {fl / 1e9:9.1f} GFLOP  "
              f"{fl / t / 1e12:6.1f} TF/s{mfu}", flush=True)
        return t

    x = mk((b, h, w, 3))

    t_vit = t_dpt = t_zoe = None
    if on("vit"):
        vit = DinoViT(**VIT_CONFIGS[args.core], dtype=dtype)
        v = init_cast(vit, x)
        t_vit = row("vit trunk(4 taps)",
                    lambda y, vv: vit.apply(vv, y, n_taps=4), x, v)

    if on("dpt"):
        dpt = DPTDinov2(args.core, dtype=dtype)
        v = init_cast(dpt, x)
        t_dpt = row("vit+dpt", lambda y, vv: dpt.apply(vv, y), x, v)

    if on("zoe"):
        zoe = ZoeDepthDA(core_type=args.core, dtype=dtype)
        v = init_cast(zoe, x)
        t_zoe = row("fine zoe full",
                    lambda y, vv: zoe.apply(vv, y)["metric_depth"], x, v)
    if t_vit and t_dpt and t_zoe:
        print(f"  -> dpt decoder {1e3 * (t_dpt - t_vit):7.2f} ms, "
              f"bins head {1e3 * (t_zoe - t_dpt):7.2f} ms", flush=True)

    # ---- DPT decoder sub-stages at exact shapes ----
    taps = [(mk((b, ph * pw, embed)), mk((b, embed))) for _ in range(4)]
    if on("head"):
        head = DPTHead(**dcfg, dtype=dtype)
        vh = init_cast(head, taps,
                       init_fn=lambda k, t: head.init(k, t, ph, pw))
        row("dpt head (isolated)",
            lambda t0, vv: head.apply(vv, [(t0, taps[0][1])] + taps[1:],
                                      ph, pw),
            taps[0][0], vh)

    class Reassemble(nn.Module):
        @nn.compact
        def __call__(self, taps):
            pyramid = []
            for i, (tok, _cls) in enumerate(taps):
                z = tok.reshape(b, ph, pw, embed)
                z = nn.Conv(oc[i], (1, 1), dtype=dtype)(z)
                if i == 0:
                    z = nn.ConvTranspose(oc[0], (4, 4), strides=(4, 4),
                                         padding="VALID",
                                         transpose_kernel=True, dtype=dtype)(z)
                elif i == 1:
                    z = nn.ConvTranspose(oc[1], (2, 2), strides=(2, 2),
                                         padding="VALID",
                                         transpose_kernel=True, dtype=dtype)(z)
                elif i == 3:
                    z = nn.Conv(oc[3], (3, 3), strides=(2, 2), padding=1,
                                dtype=dtype)(z)
                pyramid.append(z)
            return [nn.Conv(feat, (3, 3), padding=1, use_bias=False,
                            dtype=dtype)(p) for p in pyramid]

    if on("reassemble"):
        re_mod = Reassemble()
        vr = init_cast(re_mod, taps)
        row("  reassemble+rn",
            lambda t0, vv: re_mod.apply(vv, [(t0, taps[0][1])] + taps[1:]),
            taps[0][0], vr)

    rn = [mk((b, ph * 4, pw * 4, feat)), mk((b, ph * 2, pw * 2, feat)),
          mk((b, ph, pw, feat)), mk((b, (ph + 1) // 2, (pw + 1) // 2, feat))]

    class Refinenets(nn.Module):
        @nn.compact
        def __call__(self, rn):
            p4 = FeatureFusionBlock(feat, dtype=dtype)(
                rn[3], size=rn[2].shape[1:3])
            p3 = FeatureFusionBlock(feat, dtype=dtype)(
                p4, rn[2], size=rn[1].shape[1:3])
            p2 = FeatureFusionBlock(feat, dtype=dtype)(
                p3, rn[1], size=rn[0].shape[1:3])
            return FeatureFusionBlock(feat, dtype=dtype)(p2, rn[0])

    if on("refinenets"):
        rf = Refinenets()
        vrf = init_cast(rf, rn)
        row("  refinenet chain",
            lambda r0, vv: rf.apply(vv, [r0] + rn[1:]), rn[0], vrf)

    p1 = mk((b, ph * 8, pw * 8, feat))

    class OutputStage(nn.Module):
        @nn.compact
        def __call__(self, p1):
            out = nn.Conv(feat // 2, (3, 3), padding=1, dtype=dtype)(p1)
            out = interpolate(out, (ph * 14, pw * 14), mode="bilinear",
                              align_corners=True)
            out = nn.Conv(32, (3, 3), padding=1, dtype=dtype)(out)
            out = nn.relu(out)
            return nn.relu(nn.Conv(1, (1, 1), dtype=dtype)(out))

    if on("output"):
        om = OutputStage()
        vo = init_cast(om, p1)
        row("  output stage", lambda z, vv: om.apply(vv, z), p1, vo)

    if on("outputops"):
        # op-level split of the output stage (measured 20.7 ms at 30% MFU):
        # conv feat->feat/2 at 224x296, bilinear up to 392x518 at feat/2
        # channels, conv feat/2->32 at full res, relu+1x1 conv to 1
        half = feat // 2
        wc1 = mk((3, 3, feat, half))
        wc2 = mk((3, 3, half, 32))
        wc3 = mk((1, 1, 32, 1))
        up_in = mk((b, ph * 4, pw * 4, half))
        full32 = mk((b, h, w, 32))
        fullh = mk((b, h, w, half))

        def conv(z, k):
            return jax.lax.conv_general_dilated(
                z, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(z.dtype)

        row("    conv f->f/2 @224x296", conv, p1, wc1)
        row("    upsample f/2 ->full", lambda z: interpolate(
            z, (h, w), mode="bilinear", align_corners=True), up_in)
        row("    conv f/2->32 @full", conv, fullh, wc2)
        row("    relu+1x1 conv @full",
            lambda z, k: jnp.maximum(conv(jnp.maximum(z, 0), k), 0),
            full32, wc3)
        # fused alternative: upsample+conv+relu chain in one jit
        def tail(z, k2, k3):
            y = interpolate(z, (h, w), mode="bilinear",
                            align_corners=True)
            y = jnp.maximum(conv(y, k2), 0)
            return jnp.maximum(conv(y, k3), 0)
        row("    up+convs tail (jit)", tail, up_in, wc2, wc3)

    # ---- metric-bins head at exact shapes ----
    if on("bins") or on("attr") or on("clb"):
        from patchfusion_tpu.models.zoedepth import (DA_OUTPUT_CHANNELS,
                                                     MetricBinsHead)
        c = DA_OUTPUT_CHANNELS[args.core]
        xd0 = mk((b, (ph + 1) // 2, (pw + 1) // 2, c))
        x_blocks = [mk((b, ph, pw, feat)), mk((b, ph * 2, pw * 2, feat)),
                    mk((b, ph * 4, pw * 4, feat)),
                    mk((b, ph * 8, pw * 8, feat))]
        last = mk((b, h, w, 32))
        rel = mk((b, h, w, 1))
        bh = MetricBinsHead(64, 128, 1e-3, 80.0, (16, 8, 4, 1), 1000.0, 2,
                            "mean", "inv", "softplus", 0.0212, 50.0,
                            dtype=dtype)
        if on("bins"):
            vb = init_cast(bh, xd0, x_blocks, last, rel)
            row("bins head (isolated)",
                lambda z, vv: bh.apply(vv, z, x_blocks, last,
                                       rel)["metric_depth"], xd0, vb)

        if on("attr"):
            # seed + projector/attractor chain only (stop before the CLB):
            # same module, probed via the intermediates it returns
            vb2 = init_cast(bh, xd0, x_blocks, last, rel)
            row("  seed+attractors",
                lambda z, vv: bh.apply(vv, z, x_blocks, last,
                                       rel)["b_embedding"], xd0, vb2)

        if on("clb"):
            from patchfusion_tpu.models.zoedepth import ConditionalLogBinomial
            from patchfusion_tpu.ops.pallas_head import (logbinomial_depth,
                                                         pick_block_rows)
            b_emb = mk((b, ph * 8, pw * 8, 128))
            b_centers = mk((b, ph * 8, pw * 8, 64))
            last_cat = mk((b, h, w, 33))
            clb = ConditionalLogBinomial(33, 128, 64, 0.0212, 50.0,
                                         dtype=dtype)
            vc = init_cast(clb, last_cat, mk((b, h, w, 128)))
            br = pick_block_rows(h)

            def clb_fused(z, vv):
                p, tn = clb.apply(vv, z, b_emb,
                                  method=ConditionalLogBinomial.
                                  params_pt_lowres)
                return logbinomial_depth(p, tn, b_centers, 0.0212, 50.0,
                                         block_rows=br)
            row("  clb+logbinom (fused)", clb_fused, last_cat, vc)


if __name__ == "__main__":
    main()
