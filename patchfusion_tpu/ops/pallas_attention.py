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
    """One (batch*head) pair: q/k/v refs are (1, Npad, Dh) bf16 blocks."""
    q = q_ref[0]  # (Npad, Dh)
    k = k_ref[0]
    v = v_ref[0]
    npad = q.shape[0]

    # bf16 logits with f32 accumulation on the MXU (matches the einsum
    # path's preferred_element_type contract)
    s = jax.lax.dot_general(
        (q * jnp.asarray(scale, q.dtype)), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Npad, Npad)

    if n_valid < npad:
        col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(q.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Npad, Dh)
    # padded q rows have l == 0 (all-masked); guard the divide — the rows
    # are sliced off by the caller but NaNs would poison any XLA fusion
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
