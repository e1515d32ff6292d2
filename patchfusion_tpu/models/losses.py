"""Training losses (reference estimator/models/losses.py).

SILogLoss (ls:14-60) is the only loss used by every shipped config; the
research-variant losses are provided for capability parity. JAX versions are
mask-by-where (no boolean indexing — static shapes for XLA).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from patchfusion_tpu.config.registry import MODELS
from patchfusion_tpu.ops.resize import interpolate

Array = jax.Array


@MODELS.register_module
class SILogLoss:
    """Scale-invariant log loss (reference losses.py:14-60):
    10 * sqrt(var(g) + beta * mean(g)^2), g = log(pred+1e-7) - log(gt+1e-7),
    over pixels with min_depth < gt < max_depth. Returns 0 when fewer than 2
    valid pixels (the reference's nan-guard, ls:37-40)."""

    def __init__(self, beta: float = 0.15, **kwargs):
        self.beta = beta

    def __call__(self, pred: Array, target: Array, min_depth: float,
                 max_depth: float,
                 additional_mask: Optional[Array] = None) -> Array:
        # pred/target: (B, H, W, 1) NHWC
        if pred.shape[1:3] != target.shape[1:3]:
            pred = interpolate(pred, target.shape[1:3], mode="bilinear",
                               align_corners=True)
        mask = (target > min_depth) & (target < max_depth)
        if additional_mask is not None:
            mask = mask & additional_mask
        m = mask.astype(jnp.float32)
        n = jnp.sum(m)
        alpha = 1e-7
        g = (jnp.log(pred + alpha) - jnp.log(target + alpha)) * m
        mean = jnp.sum(g) / jnp.maximum(n, 1.0)
        # torch.var default = unbiased (n-1 denominator)
        var = jnp.sum(jnp.where(mask, (g - mean) ** 2, 0.0)) / \
            jnp.maximum(n - 1.0, 1.0)
        loss = 10.0 * jnp.sqrt(var + self.beta * mean ** 2)
        return jnp.where(n > 1, loss, 0.0)


@MODELS.register_module
class ScaleAndShiftInvariantLoss:
    """reference losses.py:565-592: align pred to gt with least-squares
    scale/shift over the valid mask, then MSE."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, pred: Array, target: Array, mask: Array) -> Array:
        m = mask.astype(jnp.float32)
        a00 = jnp.sum(m * pred * pred, axis=(1, 2, 3))
        a01 = jnp.sum(m * pred, axis=(1, 2, 3))
        a11 = jnp.sum(m, axis=(1, 2, 3))
        b0 = jnp.sum(m * pred * target, axis=(1, 2, 3))
        b1 = jnp.sum(m * target, axis=(1, 2, 3))
        det = a00 * a11 - a01 * a01
        scale = jnp.where(det > 0, (a11 * b0 - a01 * b1) / det, 0.0)
        shift = jnp.where(det > 0, (-a01 * b0 + a00 * b1) / det, 0.0)
        aligned = scale[:, None, None, None] * pred + \
            shift[:, None, None, None]
        res = jnp.sum(m * (aligned - target) ** 2, axis=(1, 2, 3)) / \
            jnp.maximum(jnp.sum(m, axis=(1, 2, 3)), 1.0)
        return jnp.mean(res)


@MODELS.register_module
class ExistLoss:
    """reference losses.py:594-613: push fine-detail gradients to exceed
    coarse gradients on high-gradient pixels."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, pred_grad: Array, coarse_grad: Array,
                 mask: Array) -> Array:
        m = mask.astype(jnp.float32)
        ratio = jnp.exp(-(pred_grad - coarse_grad)) * m
        return jnp.sum(ratio) / jnp.maximum(jnp.sum(m), 1.0)
