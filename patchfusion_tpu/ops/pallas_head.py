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
    assert oh % block_rows == 0 and block_rows % 8 == 0, (oh, block_rows)

    i0_np, th_np = _h_taps(oh, ih)
    ww_np = resize_matrix(ow, iw, "bilinear", align_corners=True)  # (OW, IW)
    c0_np = _log_binom_coeffs(k)[None]          # (1, K)
    karr_np = np.arange(k, dtype=np.float32)[None]

    # Mosaic DMA slices must be lane-aligned: pad the bin axis to 128 with
    # -inf logit coefficients (their softmax weight is exactly 0).
    k_real = float(k - 1)
    if k % 128 != 0:
        kp = -(-k // 128) * 128
        centers = jnp.pad(centers, [(0, 0)] * 3 + [(0, kp - k)])
        c0_np = np.pad(c0_np, [(0, 0), (0, kp - k)],
                       constant_values=-1e30)
        karr_np = np.pad(karr_np, [(0, 0), (0, kp - k)])
        k = kp

    n_chunks = oh // block_rows
    # max src rows any output chunk touches (+1 tap, +1 slack)
    span = int(np.ceil(block_rows * ih / oh)) + 2
    span = min(span + (-span) % 8, ih)  # sublane-align the DMA

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
        # (BH, IW, K) x (OW, IW) -> (BH, K, OW)
        cent = jax.lax.dot_general(
            rows, ww_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        cent = jnp.swapaxes(cent, 1, 2)  # (BH, OW, K)

        pv = p_ref[0]                                    # (BH, OW)
        tv = t_ref[0] * (max_temp - min_temp) + min_temp
        eps = 1e-4
        pc = jnp.clip(pv, eps, 1.0)[..., None]
        omp = jnp.clip(1.0 - pc, eps, 1.0)
        kk = karr_ref[0]
        y = (c0_ref[0] + kk * jnp.log(pc)
             + (k_real - kk) * jnp.log(omp)) / tv[..., None]
        y = y - jnp.max(y, axis=-1, keepdims=True)
        e = jnp.exp(y)
        out_ref[0] = jnp.sum(e * cent, axis=-1) / jnp.sum(e, axis=-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # i0 taps + th weights land in SMEM
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, block_rows, ow), lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows, ow), lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # stays in HBM
            pl.BlockSpec((ow, iw), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j, *_: (0, 0),
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
    )(jnp.asarray(i0_np), jnp.asarray(th_np),
      p.astype(jnp.float32), t.astype(jnp.float32), centers,
      jnp.asarray(ww_np), jnp.asarray(c0_np), jnp.asarray(karr_np))
    return out


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
