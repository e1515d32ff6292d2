"""Fused Pallas kernel for the metric-bins output stage.

The reference head materializes, at full process resolution x n_bins
(16 tiles x 392 x 518 x 64), four+ intermediate tensors: the upsampled bin
centers, the log-binomial logits, the softmax probabilities, and the
probability-weighted centers (zoedepth_v1.py:211-219 / patchfusion.py:
329-339 + dist_layers.py:51-69). On TPU that is ~15 GB of HBM traffic per
tile batch for ~0 FLOPs of real work — the head is purely memory-bound.

This kernel fuses the whole stage into ONE pass:

    depth[b, y, x] = sum_k softmax_k( (logC(K-1,k) + k*log p + (K-1-k)
                     * log(1-p)) / t ) * upsample(centers)[b, y, x, k]

reading only the SMALL centers map (B, IH, IW, K) plus per-pixel (p, t),
and writing the depth map. The align_corners=True bilinear upsample of the
centers is folded in: H-axis 2-tap lerp via dynamic VMEM row reads, W-axis
lerp as a banded-matrix MXU contraction. Everything else lives in registers/
VMEM.

Numerics follow the reference bit-for-bit up to reassociation: f32 logits,
max-subtracted softmax, f32 accumulation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from patchfusion_tpu.ops.resize import _source_coords, resize_matrix

Array = jax.Array


def _log_binom_coeffs(k: int) -> np.ndarray:
    """log nCk via the reference's Stirling form (dist_layers.py:29-33)."""
    e = 1e-7
    n = np.float64(k - 1) + e
    kk = np.arange(k, dtype=np.float64) + e
    d = np.maximum(n - kk, 0.0)
    return (n * np.log(n) - kk * np.log(kk) - d * np.log(d + e)
            ).astype(np.float32)


def pick_block_rows(out_h: int, max_rows: int = 16) -> int:
    """Largest divisor of out_h that is a multiple of 8 and <= max_rows
    (Mosaic requires the block's second-minor dim divisible by 8); 0 if
    none exists."""
    for d in range(max_rows - max_rows % 8, 7, -8):
        if out_h % d == 0:
            return d
    return 0


def _h_taps(out_h: int, in_h: int) -> Tuple[np.ndarray, np.ndarray]:
    src = np.clip(_source_coords(out_h, in_h, True), 0, in_h - 1)
    i0 = np.clip(np.floor(src).astype(np.int32), 0, in_h - 1)
    t = (src - i0).astype(np.float32)
    return i0, t


class _HeadPlan:
    """Shared host-side setup for the fused head kernels: H-axis taps,
    banded W-resize matrix, sublane-padded log-binomial constants, 128-lane
    centers padding and the source-row DMA span. Factoring it keeps
    _logbinomial_depth_impl and _clb_depth_impl from drifting apart
    (the two kernels fuse the same epilogue)."""

    def __init__(self, oh: int, ow: int, ih: int, iw: int, k: int,
                 centers: Array, block_rows: int):
        assert oh % block_rows == 0 and block_rows % 8 == 0, (oh, block_rows)
        self.i0_np, self.th_np = _h_taps(oh, ih)
        self.ww_np = resize_matrix(ow, iw, "bilinear",
                                   align_corners=True)  # (OW, IW)
        self.k_real = float(k - 1)
        self.k_arith = k + (-k) % 8            # sublane-aligned bin count
        self.c0_np = np.pad(_log_binom_coeffs(k), (0, self.k_arith - k),
                            constant_values=-1e30)[:, None]     # (Ka, 1)
        self.karr_np = np.pad(np.arange(k, dtype=np.float32),
                              (0, self.k_arith - k))[:, None]   # (Ka, 1)
        # Mosaic DMA slices must be lane-aligned: pad the bin axis to 128 so
        # HBM→VMEM row copies and the MXU contraction tile cleanly
        if k % 128 != 0:
            kp = -(-k // 128) * 128
            centers = jnp.pad(centers, [(0, 0)] * 3 + [(0, kp - k)])
            k = kp
        self.centers = centers
        self.k_pad = k
        self.n_chunks = oh // block_rows
        # max src rows any output chunk touches (+1 tap, +1 slack)
        span = int(np.ceil(block_rows * ih / oh)) + 2
        self.span = min(span + (-span) % 8, ih)  # sublane-align the DMA


def _logbinom_expect(pv, tv, cent, c0_ref, karr_ref, k_real):
    """In-kernel epilogue shared by both fused heads: per-pixel log-binomial
    logits over the sublane bin axis, max-subtracted softmax, and the
    probability-weighted depth expectation (dist_layers.py:51-69 +
    zoedepth_v1.py:217-219). pv/tv: (BH, OW); cent: (BH, Ka, OW)."""
    eps = 1e-4
    pc = jnp.clip(pv, eps, 1.0)[:, None, :]          # (BH, 1, OW)
    omp = jnp.clip(1.0 - pc, eps, 1.0)
    kk = karr_ref[...][None]                         # (1, Ka, 1)
    y = (c0_ref[...][None] + kk * jnp.log(pc)
         + (k_real - kk) * jnp.log(omp)) / tv[:, None, :]
    y = y - jnp.max(y, axis=-2, keepdims=True)
    e = jnp.exp(y)
    return jnp.sum(e * cent, axis=-2) / jnp.sum(e, axis=-2)


@functools.partial(jax.jit, static_argnames=("min_temp", "max_temp",
                                             "block_rows"))
def logbinomial_depth(p: Array, t: Array, centers: Array,
                      min_temp: float = 0.0212, max_temp: float = 50.0,
                      block_rows: int = 28) -> Array:
    """Fused depth expectation (differentiable: custom VJP below).

    Args:
      p: (B, OH, OW) probability parameter in (0, 1) (already the p0/(p0+p1)
        ratio from the CLB mlp).
      t: (B, OH, OW) temperature in (0, 1) (pre min/max scaling; the kernel
        applies t*(max-min)+min, dist_layers.py:119).
      centers: (B, IH, IW, K) bin centers at the last attractor resolution.
    Returns:
      (B, OH, OW) float32 depth.
    """
    return _logbinomial_depth_diff(p, t, centers, min_temp, max_temp,
                                   block_rows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _logbinomial_depth_diff(p, t, centers, min_temp, max_temp, block_rows):
    """Forward = the Pallas kernel; backward = VJP of the (mathematically
    identical) unfused reference formulation. pallas_call has no autodiff
    rule, and the PF-owned metric-bins head sits on the TRAINABLE path of
    the fusion stage (patchfusion.py:386-397), so the bf16/--amp train step
    must be able to differentiate through this op. The recomputing backward
    costs one unfused head pass per step — negligible next to the fusion
    U-Net backward at training batch sizes."""
    return _logbinomial_depth_impl(p, t, centers, min_temp, max_temp,
                                   block_rows)


def _logbinomial_fwd(p, t, centers, min_temp, max_temp, block_rows):
    out = _logbinomial_depth_impl(p, t, centers, min_temp, max_temp,
                                  block_rows)
    return out, (p, t, centers)


def _logbinomial_bwd(min_temp, max_temp, block_rows, res, g):
    p, t, centers = res
    _, vjp = jax.vjp(
        lambda p_, t_, c_: logbinomial_depth_reference(
            p_, t_, c_, min_temp, max_temp), p, t, centers)
    return vjp(g)


_logbinomial_depth_diff.defvjp(_logbinomial_fwd, _logbinomial_bwd)


def _logbinomial_depth_impl(p: Array, t: Array, centers: Array,
                            min_temp: float, max_temp: float,
                            block_rows: int) -> Array:
    b, oh, ow = p.shape
    _, ih, iw, k = centers.shape
    # bin axis on SUBLANES for the per-pixel math (K=64 → half the vregs of
    # a 128-lane-padded layout, and sublane reductions beat cross-lane
    # shuffles); coefficients as (K, 1) columns broadcast over OW lanes
    plan = _HeadPlan(oh, ow, ih, iw, k, centers, block_rows)
    centers, k_arith, k_real = plan.centers, plan.k_arith, plan.k_real
    k, span = plan.k_pad, plan.span

    def kernel(i0_ref, th_ref, p_ref, t_ref, centers_ref, ww_ref, c0_ref,
               karr_ref, out_ref, src_ref, rows_ref, sem):
        bi = pl.program_id(0)
        r0 = pl.program_id(1) * block_rows
        base = jnp.minimum(i0_ref[r0], ih - span)
        # DMA only the needed source rows HBM -> VMEM (whole centers map
        # would not fit double-buffered in VMEM)
        cp = pltpu.make_async_copy(
            centers_ref.at[bi, pl.ds(base, span)], src_ref, sem)
        cp.start()
        cp.wait()

        def h_row(i, _):
            idx = i0_ref[r0 + i] - base
            w1 = th_ref[r0 + i]
            row0 = src_ref[idx].astype(jnp.float32)          # (IW, K)
            row1 = src_ref[jnp.minimum(idx + 1, span - 1)].astype(
                jnp.float32)
            rows_ref[i] = row0 * (1.0 - w1) + row1 * w1
            return 0

        jax.lax.fori_loop(0, block_rows, h_row, 0)
        rows = rows_ref[...]
        # W-axis lerp as a banded-matrix contraction on the MXU:
        # (BH, IW, K) x (OW, IW) -> (BH, K, OW); keep K on sublanes and
        # OW on lanes for the whole per-pixel chain (no swapaxes)
        cent = jax.lax.dot_general(
            rows, ww_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)[:, :k_arith, :]

        pv = p_ref[0]                                    # (BH, OW)
        tv = t_ref[0] * (max_temp - min_temp) + min_temp
        out_ref[0] = _logbinom_expect(pv, tv, cent, c0_ref, karr_ref,
                                      k_real)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # i0 taps + th weights land in SMEM
        grid=(b, plan.n_chunks),
        in_specs=[
            pl.BlockSpec((1, block_rows, ow), lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows, ow), lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM
            pl.BlockSpec((ow, iw), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_arith, 1), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_arith, 1), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, ow),
                               lambda i, j, *_: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((span, iw, k), centers.dtype),
            pltpu.VMEM((block_rows, iw, k), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, oh, ow), jnp.float32),
    )(jnp.asarray(plan.i0_np), jnp.asarray(plan.th_np),
      p.astype(jnp.float32), t.astype(jnp.float32), centers,
      jnp.asarray(plan.ww_np), jnp.asarray(plan.c0_np),
      jnp.asarray(plan.karr_np))
    return out


# ---------------------------------------------------------------------------
# Deep-fused CLB stage: the whole ConditionalLogBinomial head in ONE pass.
#
# The unfused bf16 stage (ConditionalLogBinomial.params_pt_lowres +
# logbinomial_depth) still streams ~3.5 GB of HBM per 16-tile chunk through
# the full-resolution 80-channel bottleneck: the x-projection writes it, the
# condition upsample writes it again, and the gelu+mlp_2 tail reads it all
# back (measured 16 ms of the 23 ms stage at the fine-branch shapes,
# tools/profile_clb.py). This kernel keeps the bottleneck in VMEM: per
# 8-row output block it reads the 33-ch input rows + the LOW-res condition
# and centers rows, and does projection, bilinear upsampling (H-taps +
# banded-W MXU contraction), gelu, mlp_2, softplus ratios, log-binomial
# softmax and the depth expectation entirely on-chip, writing only the
# depth rows. Implements reference dist_layers.py:72-121 +
# zoedepth_v1.py:211-219 in one kernel.
#
# STATUS: EXPERIMENTAL-FROZEN — interpret-verified (parity + VJP tests) but
# NOT the default model path and not pending perf work. On the axon
# remote-TPU tunnel the Mosaic compile of this kernel exhausts the
# compile-helper process (SIGKILL) even with reduced hdim/row-block tiling;
# the one variant that compiles (fori-loop over H-taps) runs SLOWER than
# the unfused XLA stage (19.5 ms vs 18.4 at the fine-branch shapes), so
# there is no configuration on this environment where the kernel both
# compiles and wins. Revisit only on directly-attached TPU hardware.
# ---------------------------------------------------------------------------


def clb_logbinomial_depth(last_cat: Array, cond_lo: Array, centers: Array,
                          w1: Array, b1: Array, w2: Array, b2: Array,
                          min_temp: float = 0.0212, max_temp: float = 50.0,
                          p_eps: float = 1e-4, block_rows: int = 8) -> Array:
    """Fused CLB depth (differentiable via recompute-unfused VJP).

    Args:
      last_cat: (B, OH, OW, Cin) input feature (last 32-ch + rel cond).
      cond_lo: (B, IH, IW, Cc) bin embedding at the LOW (attractor) res.
      centers: (B, IH, IW, K) bin centers at the same low res.
      w1/b1: mlp_0 kernel (Cin+Cc, H) and bias (H,).
      w2/b2: mlp_2 kernel (H, 4) and bias (4,).
    Returns: (B, OH, OW) float32 depth.
    """
    return _clb_depth_diff(last_cat, cond_lo, centers, w1, b1, w2, b2,
                           min_temp, max_temp, p_eps, block_rows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _clb_depth_diff(last_cat, cond_lo, centers, w1, b1, w2, b2,
                    min_temp, max_temp, p_eps, block_rows):
    """Forward = Pallas kernel; backward = VJP of the mathematically
    identical unfused composition (the PF-owned head is on the trainable
    fusion path, patchfusion.py:386-397)."""
    return _clb_depth_impl(last_cat, cond_lo, centers, w1, b1, w2, b2,
                           min_temp, max_temp, p_eps, block_rows)


def _clb_depth_fwd(last_cat, cond_lo, centers, w1, b1, w2, b2,
                   min_temp, max_temp, p_eps, block_rows):
    out = _clb_depth_impl(last_cat, cond_lo, centers, w1, b1, w2, b2,
                          min_temp, max_temp, p_eps, block_rows)
    return out, (last_cat, cond_lo, centers, w1, b1, w2, b2)


def _clb_depth_bwd(min_temp, max_temp, p_eps, block_rows, res, g):
    _, vjp = jax.vjp(
        lambda *a: clb_depth_reference(*a, min_temp=min_temp,
                                       max_temp=max_temp, p_eps=p_eps),
        *res)
    return vjp(g)


_clb_depth_diff.defvjp(_clb_depth_fwd, _clb_depth_bwd)


def _clb_depth_impl(last_cat: Array, cond_lo: Array, centers: Array,
                    w1: Array, b1: Array, w2: Array, b2: Array,
                    min_temp: float, max_temp: float, p_eps: float,
                    block_rows: int) -> Array:
    b, oh, ow, cin = last_cat.shape
    _, ih, iw, cc = cond_lo.shape
    _, cih, ciw, k = centers.shape
    assert (cih, ciw) == (ih, iw), "cond and centers must share the low res"
    hdim = w1.shape[1]

    plan = _HeadPlan(oh, ow, ih, iw, k, centers, block_rows)
    centers, k_arith, k_real = plan.centers, plan.k_arith, plan.k_real
    k, span = plan.k_pad, plan.span
    if cc % 128 != 0:
        ccp = -(-cc // 128) * 128
        cond_lo = jnp.pad(cond_lo, [(0, 0)] * 3 + [(0, ccp - cc)])
    else:
        ccp = cc

    w1a = jnp.asarray(w1[:cin], jnp.float32)           # (Cin, H)
    w1c = jnp.asarray(
        jnp.pad(w1[cin:], [(0, ccp - cc), (0, 0)]), jnp.float32)  # (Ccp, H)
    w2f = jnp.asarray(w2, jnp.float32)                 # (H, 4)
    b1c = jnp.asarray(b1, jnp.float32)[None]           # (1, H)
    b2c = jnp.asarray(b2, jnp.float32)[None]           # (1, 4)

    def kernel(i0_ref, th_ref, last_ref, centers_ref, cond_ref, ww_ref,
               w1a_ref, w1c_ref, b1_ref, w2f_ref, b2_ref, c0_ref, karr_ref,
               out_ref, src_c, src_b, rows_c, proj_src, rows_b,
               sem_c, sem_b):
        bi = pl.program_id(0)
        r0 = pl.program_id(1) * block_rows
        base = jnp.minimum(i0_ref[r0], ih - span)
        cp_c = pltpu.make_async_copy(
            centers_ref.at[bi, pl.ds(base, span)], src_c, sem_c)
        cp_b = pltpu.make_async_copy(
            cond_ref.at[bi, pl.ds(base, span)], src_b, sem_b)
        cp_c.start()
        cp_b.start()
        cp_c.wait()
        cp_b.wait()

        # project the condition at LOW res (lerp∘project == project∘lerp;
        # this is the in-kernel form of params_pt_lowres' commute)
        proj_src[...] = jax.lax.dot_general(
            src_b[...].astype(jnp.float32), w1c_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (span, IW, H)

        def h_row(i, _):
            idx = i0_ref[r0 + i] - base
            wgt = th_ref[r0 + i]
            c_row0 = src_c[idx].astype(jnp.float32)
            c_row1 = src_c[jnp.minimum(idx + 1, span - 1)].astype(
                jnp.float32)
            rows_c[i] = c_row0 * (1.0 - wgt) + c_row1 * wgt
            b_row0 = proj_src[idx]
            b_row1 = proj_src[jnp.minimum(idx + 1, span - 1)]
            rows_b[i] = b_row0 * (1.0 - wgt) + b_row1 * wgt
            return 0

        jax.lax.fori_loop(0, block_rows, h_row, 0)

        # W-axis lerps as banded-matrix MXU contractions
        cent = jax.lax.dot_general(
            rows_c[...], ww_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)[:, :k_arith, :]
        bterm = jnp.swapaxes(jax.lax.dot_general(
            rows_b[...], ww_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32), 1, 2)  # (BH, OW, H)

        # input projection, channel-minor (one big minor-dim contraction)
        a = jax.lax.dot_general(
            last_ref[0].astype(jnp.float32), w1a_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (BH, OW, H)

        # tanh-gelu: the bf16 compute path's activation (ops/activations.py)
        h = jax.nn.gelu(a + bterm + b1_ref[...][None], approximate=True)
        out4 = jax.lax.dot_general(
            h, w2f_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (BH, OW, 4)
        pt = jax.nn.softplus(out4 + b2_ref[...][None])
        p0 = pt[..., 0] + p_eps
        p1 = pt[..., 1] + p_eps
        pv = p0 / (p0 + p1)                            # (BH, OW)
        t0 = pt[..., 2] + p_eps
        t1 = pt[..., 3] + p_eps
        tv = (t0 / (t0 + t1)) * (max_temp - min_temp) + min_temp
        out_ref[0] = _logbinom_expect(pv, tv, cent, c0_ref, karr_ref,
                                      k_real)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, plan.n_chunks),
        in_specs=[
            pl.BlockSpec((1, block_rows, ow, cin),
                         lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # centers in HBM
            pl.BlockSpec(memory_space=pl.ANY),      # cond in HBM
            pl.BlockSpec((ow, iw), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, hdim), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ccp, hdim), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, 4), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_arith, 1), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_arith, 1), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, ow),
                               lambda i, j, *_: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((span, iw, k), centers.dtype),
            pltpu.VMEM((span, iw, ccp), cond_lo.dtype),
            pltpu.VMEM((block_rows, iw, k), jnp.float32),
            pltpu.VMEM((span, iw, hdim), jnp.float32),
            pltpu.VMEM((block_rows, iw, hdim), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, oh, ow), jnp.float32),
    )(jnp.asarray(plan.i0_np), jnp.asarray(plan.th_np), last_cat, centers,
      cond_lo, jnp.asarray(plan.ww_np), w1a, w1c, b1c, w2f, b2c,
      jnp.asarray(plan.c0_np), jnp.asarray(plan.karr_np))
    return out


# ---------------------------------------------------------------------------
# Fused CLB parameter stage (p, t) — the "pre" half of the head.
#
# The unfused bf16 stage (ConditionalLogBinomial.params_pt_lowres) costs
# 16 ms of the 18.4 ms CLB stage at the fine-branch shapes (tools/
# profile_clb.py): XLA materializes the full-resolution 80-channel
# bottleneck three times (x-projection write, condition-upsample write,
# gelu+mlp_2 read-back) — ~3.4 GB of HBM per 16-tile chunk sustaining only
# ~210 GB/s because every pass is a small-K matmul. This kernel keeps the
# bottleneck entirely in VMEM: per 8-row output block it DMAs the low-res
# condition rows, projects them on the MXU, lerps H (dynamic row taps) and
# W (banded-matrix contraction), projects the 33-ch input rows, and runs
# the gelu+mlp_2+softplus tail — writing only the two (B, OH, OW) maps.
# It is the deep clb_logbinomial_depth kernel MINUS the centers-upsample +
# log-binomial epilogue (which stays in the separately-proven
# logbinomial_depth kernel): that epilogue is what pushed the deep
# kernel's Mosaic compile over the remote helper's memory.
# Implements reference dist_layers.py:103-121 (the ConditionalLogBinomial
# MLP) at params_pt_lowres' commuted-projection formulation.
# ---------------------------------------------------------------------------


def clb_pt(last_cat: Array, cond_lo: Array, w1: Array, b1: Array,
           w2: Array, b2: Array, p_eps: float = 1e-4,
           block_rows: int = 8) -> Tuple[Array, Array]:
    """Fused (p, t_norm) parameter maps (differentiable via recompute VJP).

    Args:
      last_cat: (B, OH, OW, Cin) input feature (last 32-ch + rel cond).
      cond_lo: (B, IH, IW, Cc) bin embedding at the LOW (attractor) res.
      w1/b1: mlp_0 kernel (Cin+Cc, H) and bias (H,).
      w2/b2: mlp_2 kernel (H, 4) and bias (4,).
    Returns: p, t_norm — both (B, OH, OW) float32, t pre temp-scaling
      (same contract as ConditionalLogBinomial.params_pt_lowres).
    """
    return _clb_pt_diff(last_cat, cond_lo, w1, b1, w2, b2, p_eps,
                        block_rows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _clb_pt_diff(last_cat, cond_lo, w1, b1, w2, b2, p_eps, block_rows):
    """Forward = Pallas kernel; backward = VJP of the mathematically
    identical unfused composition (the PF-owned head is on the trainable
    fusion path, patchfusion.py:386-397)."""
    return _clb_pt_impl(last_cat, cond_lo, w1, b1, w2, b2, p_eps,
                        block_rows)


def _clb_pt_fwd(last_cat, cond_lo, w1, b1, w2, b2, p_eps, block_rows):
    out = _clb_pt_impl(last_cat, cond_lo, w1, b1, w2, b2, p_eps,
                       block_rows)
    return out, (last_cat, cond_lo, w1, b1, w2, b2)


def _clb_pt_bwd(p_eps, block_rows, res, g):
    _, vjp = jax.vjp(
        lambda *a: clb_pt_reference(*a, p_eps=p_eps), *res)
    return vjp(g)


_clb_pt_diff.defvjp(_clb_pt_fwd, _clb_pt_bwd)


def _clb_pt_impl(last_cat: Array, cond_lo: Array, w1: Array, b1: Array,
                 w2: Array, b2: Array, p_eps: float,
                 block_rows: int) -> Tuple[Array, Array]:
    b, oh, ow, cin = last_cat.shape
    _, ih, iw, cc = cond_lo.shape
    hdim = w1.shape[1]
    assert oh % block_rows == 0 and block_rows % 8 == 0, (oh, block_rows)

    i0_np, th_np = _h_taps(oh, ih)
    ww_np = resize_matrix(ow, iw, "bilinear", align_corners=True)  # (OW, IW)
    span = int(np.ceil(block_rows * ih / oh)) + 2
    span = min(span + (-span) % 8, ih)
    n_chunks = oh // block_rows
    # per-chunk H-lerp slab: rows_b = hh[j] @ proj_src is an MXU
    # contraction instead of a fori_loop of dynamically-indexed VMEM row
    # reads (Mosaic lowers those to per-row copies — measured 2x slower
    # than the whole unfused stage)
    base_np = np.minimum(i0_np[::block_rows], ih - span)   # (n_chunks,)
    hh_np = np.zeros((n_chunks, block_rows, span), np.float32)
    for j in range(n_chunks):
        for r in range(block_rows):
            g = j * block_rows + r
            i = int(i0_np[g] - base_np[j])
            w = float(th_np[g])
            hh_np[j, r, i] += 1.0 - w
            hh_np[j, r, min(i + 1, span - 1)] += w
    if cc % 128 != 0:
        ccp = -(-cc // 128) * 128
        cond_lo = jnp.pad(cond_lo, [(0, 0)] * 3 + [(0, ccp - cc)])
    else:
        ccp = cc

    w1a = jnp.asarray(w1[:cin], jnp.float32)                     # (Cin, H)
    w1c = jnp.asarray(
        jnp.pad(w1[cin:], [(0, ccp - cc), (0, 0)]), jnp.float32)  # (Ccp, H)
    w2f = jnp.asarray(w2, jnp.float32)                           # (H, 4)
    b1c = jnp.asarray(b1, jnp.float32)[None]                     # (1, H)
    b2c = jnp.asarray(b2, jnp.float32)[None]                     # (1, 4)

    def kernel(base_ref, hh_ref, last_ref, cond_ref, ww_ref, w1a_ref,
               w1c_ref, b1_ref, w2f_ref, b2_ref, p_ref, t_ref,
               src_b, sem_b):
        bi = pl.program_id(0)
        j = pl.program_id(1)
        cp_b = pltpu.make_async_copy(
            cond_ref.at[bi, pl.ds(base_ref[j], span)], src_b, sem_b)
        cp_b.start()
        cp_b.wait()

        # project the condition at LOW res (lerp∘project == project∘lerp;
        # the in-kernel form of params_pt_lowres' commute)
        proj_src = jax.lax.dot_general(
            src_b[...].astype(jnp.float32), w1c_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (span, IW, H)

        # H-axis lerp with the per-chunk slab, statically unrolled over the
        # small source span: each term is a (block,) x (IW, H) broadcast
        # multiply — no dynamic VMEM indexing (Mosaic lowers that to
        # per-row copies) and no 3D dot_general (unsupported shape cast)
        hh = hh_ref[0]                                   # (BH, span)
        rows_b = hh[:, 0][:, None, None] * proj_src[0][None]
        for s in range(1, span):
            rows_b = rows_b + hh[:, s][:, None, None] * proj_src[s][None]

        # W-axis lerp as a banded-matrix MXU contraction
        bterm = jnp.swapaxes(jax.lax.dot_general(
            rows_b, ww_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32), 1, 2)   # (BH, OW, H)

        # input projection, channel-minor
        a = jax.lax.dot_general(
            last_ref[0].astype(jnp.float32), w1a_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (BH, OW, H)

        # tanh-gelu at the INPUT dtype: in-model (bf16) this matches the
        # default path, where _pt_tail's act_gelu sees a bf16 bottleneck
        # (and halves the vreg pressure); f32 inputs keep f32 for the
        # interpret-mode parity tests
        act_dt = last_ref.dtype
        h = jax.nn.gelu((a + bterm + b1_ref[...][None]).astype(act_dt),
                        approximate=True)
        out4 = jax.lax.dot_general(
            h, w2f_ref[...].astype(act_dt),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (BH, OW, 4)
        pt = jax.nn.softplus(out4 + b2_ref[...][None])
        p0 = pt[..., 0] + p_eps
        p1 = pt[..., 1] + p_eps
        p_ref[0] = p0 / (p0 + p1)
        t0 = pt[..., 2] + p_eps
        t1 = pt[..., 3] + p_eps
        t_ref[0] = t0 / (t0 + t1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, block_rows, span), lambda i, j, *_: (j, 0, 0),
                         memory_space=pltpu.VMEM),       # H-lerp slab
            pl.BlockSpec((1, block_rows, ow, cin),
                         lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),           # cond in HBM
            pl.BlockSpec((ow, iw), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, hdim), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ccp, hdim), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, 4), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_rows, ow), lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows, ow), lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((span, iw, ccp), cond_lo.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((b, oh, ow), jnp.float32),
                   jax.ShapeDtypeStruct((b, oh, ow), jnp.float32)),
    )(jnp.asarray(base_np), jnp.asarray(hh_np), last_cat, cond_lo,
      jnp.asarray(ww_np), w1a, w1c, b1c, w2f, b2c)


def clb_pt_reference(last_cat: Array, cond_lo: Array, w1: Array, b1: Array,
                     w2: Array, b2: Array, p_eps: float = 1e-4
                     ) -> Tuple[Array, Array]:
    """Unfused composition of the same math (tanh-gelu bf16-path contract):
    params_pt_lowres without the module wrapper. Used by the fused kernel's
    VJP and by the parity tests."""
    from patchfusion_tpu.ops.resize import interpolate

    cin = last_cat.shape[-1]
    oh, ow = last_cat.shape[1:3]
    a = jnp.einsum("bhwc,cf->bhwf", last_cat.astype(jnp.float32),
                   w1[:cin].astype(jnp.float32))
    bb = jnp.einsum("bhwc,cf->bhwf", cond_lo.astype(jnp.float32),
                    w1[cin:].astype(jnp.float32))
    bb = interpolate(bb, (oh, ow), mode="bilinear", align_corners=True)
    h = a + bb + b1.astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True)
    pt = jax.nn.softplus(jnp.einsum("bhwf,fo->bhwo", h,
                                    w2.astype(jnp.float32))
                         + b2.astype(jnp.float32))
    p = pt[..., :2] + p_eps
    p = p[..., 0] / (p[..., 0] + p[..., 1])
    t = pt[..., 2:] + p_eps
    t = t[..., 0] / (t[..., 0] + t[..., 1])
    return p, t


def clb_depth_reference(last_cat: Array, cond_lo: Array, centers: Array,
                        w1: Array, b1: Array, w2: Array, b2: Array,
                        min_temp: float = 0.0212, max_temp: float = 50.0,
                        p_eps: float = 1e-4) -> Array:
    """Unfused f32 composition of the same math (tanh-gelu bf16-path
    contract): params_pt_lowres + logbinomial_depth_reference. Used by the
    fused kernel's VJP and by the parity tests."""
    from patchfusion_tpu.ops.resize import interpolate

    cin = last_cat.shape[-1]
    oh, ow = last_cat.shape[1:3]
    a = jnp.einsum("bhwc,cf->bhwf", last_cat.astype(jnp.float32),
                   w1[:cin].astype(jnp.float32))
    bb = jnp.einsum("bhwc,cf->bhwf", cond_lo.astype(jnp.float32),
                    w1[cin:].astype(jnp.float32))
    bb = interpolate(bb, (oh, ow), mode="bilinear", align_corners=True)
    h = a + bb + b1.astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True)
    pt = jax.nn.softplus(jnp.einsum("bhwf,fo->bhwo", h,
                                    w2.astype(jnp.float32))
                         + b2.astype(jnp.float32))
    p = pt[..., :2] + p_eps
    p = p[..., 0] / (p[..., 0] + p[..., 1])
    t = pt[..., 2:] + p_eps
    t = t[..., 0] / (t[..., 0] + t[..., 1])
    return logbinomial_depth_reference(p, t, centers, min_temp, max_temp)


def logbinomial_depth_reference(p: Array, t: Array, centers: Array,
                                min_temp: float = 0.0212,
                                max_temp: float = 50.0) -> Array:
    """Unfused reference implementation (for testing / CPU fallback):
    exactly the reference math (dist_layers.py + zoedepth_v1.py:211-219)."""
    from patchfusion_tpu.ops.resize import interpolate

    b, oh, ow = p.shape
    k = centers.shape[-1]
    cent = interpolate(centers.astype(jnp.float32), (oh, ow),
                       mode="bilinear", align_corners=True)
    tv = t.astype(jnp.float32) * (max_temp - min_temp) + min_temp
    eps = 1e-4
    pc = jnp.clip(p.astype(jnp.float32), eps, 1.0)[..., None]
    omp = jnp.clip(1.0 - pc, eps, 1.0)
    kk = jnp.arange(k, dtype=jnp.float32)
    c0 = jnp.asarray(_log_binom_coeffs(k))
    y = (c0 + kk * jnp.log(pc) + (float(k - 1) - kk) * jnp.log(omp)) \
        / tv[..., None]
    probs = jax.nn.softmax(y, axis=-1)
    return jnp.sum(probs * cent, axis=-1)
