"""Activation dispatch for the bf16/f32 compute contract.

The reference models use exact (erf) GELU everywhere (torch nn.GELU
default). On TPU the erf lowering is the single most expensive VPU op in
the ViT trunk: at the fine-branch shape (vitl, batch 16, 392x518) the
trunk forward measures 242 ms with exact GELU vs 169 ms with the tanh
approximation, while the output deviation (max 1.6e-2 at |x|~4) is below
bf16's own rounding step at those magnitudes. So the bf16 compute path —
whose contract already absorbs ~1e-2 — uses tanh-GELU, and the f32 path
keeps the exact erf form for bit-comparable parity with the reference.
"""

import jax
import jax.numpy as jnp

Array = jax.Array


def gelu(x: Array) -> Array:
    """Exact GELU in f32; tanh-approximated on the bf16 compute path."""
    return jax.nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))
