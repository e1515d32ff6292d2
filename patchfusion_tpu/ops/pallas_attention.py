"""Pallas TPU self-attention for ViT shapes (short sequence, d_head 64).

Why a custom kernel: the fine-branch DINOv2 attention (B~16, H16, N~1037,
Dh64) is HBM-bound in the XLA einsum formulation — the N^2 logits/probs
matrices are materialized in HBM (~3.3 GB of traffic per vitl layer call,
measured at the ~800 GB/s roofline). The stock Pallas flash/splash kernels
lose here too (6.1-6.5 ms vs 4.3 ms einsum at batch 16): they are tuned for
LLM sequence lengths and stream K/V in 128-row blocks, paying grid overhead
that dwarfs this problem size.

At ViT sizes the whole score matrix for one (batch, head) pair fits in VMEM
(1152 x 1152 f32 = 5.3 MB), so no streaming softmax is needed at all: grid
over (B*H,), each step loads that pair's q/k/v rows (147 KB each), does
qk^T -> one-shot masked softmax -> pv entirely on-chip, and writes only the
(N, Dh) output. HBM traffic is exactly Q+K+V+O (~136 MB per vitl layer call
at batch 16) — ~24x less than the einsum path.

Measured result (v5e-1, BASELINE.md round-3): the kernel TIES the einsum
(4.4-5.0 ms both at batch 16) — the op is VPU-softmax-bound, not HBM-bound,
and both formulations pay the same N^2 max/exp passes (XLA overlaps the
einsum's HBM traffic behind them). Kept as a selectable implementation
(PF_ATTN_IMPL=pallas / fused_attention(impl="pallas")) because the
tradeoff is generation-dependent: on a part with a faster VPU or slower
HBM the VMEM-resident form wins.

Numerics match `models/dinov2.fused_attention`'s bf16 contract: bf16 q*k
logits in f32 accumulation, f32 max-subtracted exp, probabilities cast to
bf16 for the MXU p@v contraction, f32 normalizer. (Reference semantics:
external/torchhub/.../dinov2/layers/attention.py:48-81.)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int, scale: float):
    """One (batch*head) pair: q/k/v refs are (1, Npad, Dh) bf16 blocks.

    Every pass over the (Npad, Npad) intermediate costs ~0.75 ms at the
    vitl chunk shapes (VMEM bandwidth, measured v5e-1), so the kernel is
    organized to touch it the minimum number of times:

      * the N^2 stage runs entirely in bf16 (logits cast straight off the
        f32 MXU accumulator, bf16 max/sub/exp) — halving the intermediate
        width beats f32 exp precision; the error stays inside the
        bf16-probability contract (~1e-2), and the normalizer accumulates
        in f32;
      * there is NO mask pass at all: softmax is shift-invariant in the
        row max, zero-padded k columns produce logits of exactly 0 and
        therefore probability exp(-m) each, and zero-padded v rows add
        nothing to p@v — so the padding is corrected exactly by
        subtracting (Npad - N) * exp(-m) from the row normalizer, a
        (Npad, 1) column op instead of an (Npad, Npad) pass.
    """
    q = q_ref[0]  # (Npad, Dh)
    k = k_ref[0]
    v = v_ref[0]
    npad = q.shape[0]
    s = jax.lax.dot_general(
        (q * jnp.asarray(scale, q.dtype)), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    m = jnp.max(s, axis=-1, keepdims=True)  # >= true max (pad logits = 0)
    p = jnp.exp(s - m)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    if n_valid < npad:
        mf = m.astype(jnp.float32)
        l = l - (npad - n_valid) * jnp.exp(-mf)
    o = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Npad, Dh)
    # l > 0 whenever at least one valid column exists; the guard protects
    # the all-padded degenerate case only
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_valid", "scale"))
def _attn_call(q: Array, k: Array, v: Array, n_valid: int,
               scale: float) -> Array:
    bh, npad, dh = q.shape
    kernel = functools.partial(_attn_kernel, n_valid=n_valid, scale=scale)
    flops = 2 * 2 * bh * npad * npad * dh
    return pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[pl.BlockSpec((1, npad, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, npad, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, npad, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * bh * npad * dh * q.dtype.itemsize,
            transcendentals=bh * npad * npad),
    )(q, k, v)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel_blocked(q_ref, k_ref, v_ref, bias_ref, o_ref,
                         *, scale: float):
    """One (bh, q-row-block) step: q (1, R, Dh), k/v (1, Npad, Dh) resident.

    Differences vs _attn_kernel that buy the speed (BASELINE.md round-3):
      * column masking is a precomputed additive bias row (one VPU add)
        instead of iota+compare+select (three passes over N^2);
      * the f32 score block is (R, Npad) instead of (Npad, Npad), cutting
        peak VMEM ~Npad/R x so Mosaic can double-buffer the q/o streams;
      * k/v block indices are constant across the inner grid axis, so they
        are DMA'd once per (batch*head) pair, not once per step.
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        (q * jnp.asarray(scale, q.dtype)), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (R, Npad)
    s = s + bias_ref[0]  # (1, Npad) broadcast: 0 valid / -1e30 padded
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(q.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_rows"))
def _attn_call_blocked(q: Array, k: Array, v: Array, bias: Array,
                       scale: float, block_rows: int) -> Array:
    bh, npad, dh = q.shape
    nb = npad // block_rows
    kernel = functools.partial(_attn_kernel_blocked, scale=scale)
    flops = 2 * 2 * bh * npad * npad * dh
    return pl.pallas_call(
        kernel,
        grid=(bh, nb),
        in_specs=[
            pl.BlockSpec((1, block_rows, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, npad, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * bh * npad * dh * q.dtype.itemsize,
            transcendentals=bh * npad * npad),
    )(q, k, v, bias)


def _attn_kernel_mxsum(q_ref, k_ref, v_ref, bias_ref, o_ref,
                       *, scale: float, bf16_exp: bool):
    """Whole-row step with the softmax row-sum ridden on the PV matmul:
    v is pre-augmented with a ones column (Dh 64 -> 65, zero-padded to 128
    which the MXU pads anyway), so l = (p @ v_ext)[:, 64] and the VPU sum
    pass over the (N, N) probabilities disappears."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]  # (Npad, 128): [v | ones | 0-pad]
    s = jax.lax.dot_general(
        (q * jnp.asarray(scale, q.dtype)), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s + bias_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    if bf16_exp:
        p = jnp.exp((s - m).astype(jnp.bfloat16))
    else:
        p = jnp.exp(s - m).astype(jnp.bfloat16)
    o_ext = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Npad, 128)
    dh = o_ref.shape[-1]
    l = o_ext[:, dh:dh + 1]
    o = o_ext[:, :dh]
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "bf16_exp"))
def _attn_call_mxsum(q: Array, k: Array, v_ext: Array, bias: Array,
                     scale: float, bf16_exp: bool) -> Array:
    bh, npad, dh = q.shape
    kernel = functools.partial(_attn_kernel_mxsum, scale=scale,
                               bf16_exp=bf16_exp)
    flops = 2 * 2 * bh * npad * npad * dh
    return pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, npad, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, npad, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, npad, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * bh * npad * dh * q.dtype.itemsize,
            transcendentals=bh * npad * npad),
    )(q, k, v_ext, bias)


def vit_attention_mxsum(q: Array, k: Array, v: Array,
                        bf16_exp: bool = False) -> Array:
    """vit_attention with the row-sum on the MXU (see _attn_kernel_mxsum)."""
    b, n, h, dh = q.shape
    npad = _round_up(n, 128)
    scale = float(dh) ** -0.5

    def to_grid(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, dh)
        if npad != n:
            x = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
        return x

    v_ext = to_grid(v)
    ones = jnp.where(
        (jnp.arange(npad) < n)[None, :, None], jnp.ones((), v_ext.dtype), 0)
    v_ext = jnp.concatenate(
        [v_ext, jnp.broadcast_to(ones.astype(v_ext.dtype),
                                 (b * h, npad, 1)),
         jnp.zeros((b * h, npad, 128 - dh - 1), v_ext.dtype)], axis=-1)
    bias = jnp.where(jnp.arange(npad) < n, 0.0, -1e30).astype(
        jnp.float32).reshape(1, npad)
    o = _attn_call_mxsum(to_grid(q), to_grid(k), v_ext, bias, scale,
                         bf16_exp)
    o = o[:, :n].reshape(b, h, n, dh)
    return jnp.transpose(o, (0, 2, 1, 3))


def vit_attention_blocked(q: Array, k: Array, v: Array,
                          block_rows: int = 384) -> Array:
    """Row-blocked VMEM-resident attention (same contract as vit_attention).

    block_rows must divide the padded sequence length (N rounded up to 128);
    384 is the measured v5e sweet spot for the vitl fine-branch shapes.
    """
    b, n, h, dh = q.shape
    npad = _round_up(n, 128)
    while npad % block_rows:
        block_rows //= 2
    scale = float(dh) ** -0.5

    def to_grid(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, dh)
        if npad != n:
            x = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
        return x

    bias = jnp.where(jnp.arange(npad) < n, 0.0, -1e30).astype(
        jnp.float32).reshape(1, npad)
    o = _attn_call_blocked(to_grid(q), to_grid(k), to_grid(v), bias,
                           scale, int(block_rows))
    o = o[:, :n].reshape(b, h, n, dh)
    return jnp.transpose(o, (0, 2, 1, 3))


def vit_attention(q: Array, k: Array, v: Array) -> Array:
    """Drop-in for the (B, N, H, Dh) einsum attention, bf16, no mask.

    Pads N to a lane multiple (masked keys), folds (B, H) into the grid
    axis, runs the VMEM-resident kernel, and restores the layout. The
    layout transposes fuse into the surrounding projection matmuls.
    """
    b, n, h, dh = q.shape
    npad = _round_up(n, 128)
    scale = float(dh) ** -0.5

    def to_grid(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, dh)
        if npad != n:
            x = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
        return x

    o = _attn_call(to_grid(q), to_grid(k), to_grid(v), n, scale)
    o = o[:, :n].reshape(b, h, n, dh)
    return jnp.transpose(o, (0, 2, 1, 3))


def vit_attention_reference(q: Array, k: Array, v: Array) -> Array:
    """f32 oracle for tests (same contract, XLA builtin)."""
    return jax.nn.dot_product_attention(q, k, v)
