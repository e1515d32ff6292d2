"""Global-to-local (G2L) shifted-window attention, TPU-native flax.

Re-design of reference estimator/models/blocks/swin_layers.py: a small Swin
stack applied to *whole-image* coarse features at each fusion level, with a
learned absolute position embedding sized per level's num_patches (config
`num_patches=[392*518, 224*296, ..., 14*19]`,
depthanything_vitl_patchfusion_u4k.py:87). The APE pins the coarse feature
resolution statically — ideal for XLA.

TPU-first: window partition/reverse are pure reshapes (ops/windows.py); the
shifted-window mask is a numpy constant folded into the program; attention is
`jax.nn.dot_product_attention` with the (relative-position + shift-mask) bias.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from patchfusion_tpu.ops.activations import gelu as act_gelu
from patchfusion_tpu.ops.windows import (pad_to_multiple, shifted_window_mask,
                                         window_partition, window_reverse)

Array = jax.Array


@functools.lru_cache(maxsize=None)
def relative_position_index(window: int) -> np.ndarray:
    """(N, N) lookup into the (2w-1)^2 relative-position-bias table
    (reference swin_layers.py:112-123)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference swin_layers.py:85-164).

    Operates on (num_windows*B, N, C); the shift mask (if any) is folded into
    the attention bias so one fused attention kernel handles both.
    """
    dim: int
    window: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[np.ndarray] = None) -> Array:
        b_, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = hd ** -0.5
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window - 1) * (2 * self.window - 1), nh))
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        idx = relative_position_index(self.window).reshape(-1)
        rel_bias = table[idx].reshape(n, n, nh).transpose(2, 0, 1)  # (nh,N,N)
        bias = rel_bias[None].astype(jnp.float32)  # (1, nh, N, N)
        if mask is not None:
            nw = mask.shape[0]
            b = b_ // nw
            # per-window shift mask + shared relative bias -> (B*nW,nh,N,N)
            bias = bias[None] + jnp.asarray(mask)[None, :, None]
            bias = jnp.broadcast_to(bias, (b, nw, nh, n, n))
            bias = bias.reshape(b_, nh, n, n)
        out = jax.nn.dot_product_attention(q, k, v, bias=bias, scale=scale)
        out = out.reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    """One (shifted-)window transformer block (swin_layers.py:171-268)."""
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, h: int, w: int) -> Array:
        b, l, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x.reshape(b, h, w, c)
        x, hp, wp = pad_to_multiple(x, self.window)

        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = shifted_window_mask(hp, wp, self.window, self.shift)
        else:
            mask = None

        wins = window_partition(x, self.window)
        wins = wins.reshape(-1, self.window * self.window, c)
        wins = WindowAttention(self.dim, self.window, self.num_heads,
                               dtype=self.dtype, name="attn")(wins, mask)
        wins = wins.reshape(-1, self.window, self.window, c)
        x = window_reverse(wins, self.window, hp, wp)

        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = x[:, :h, :w].reshape(b, h * w, c)
        x = shortcut + x

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = act_gelu(y)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class G2LFusion(nn.Module):
    """Whole-image G2L attention stage (swin_layers.py:360-431): APE +
    `depth` alternating W-MSA/SW-MSA blocks + final LayerNorm.

    Input/output (B, H, W, C); H*W must equal `num_patches` (the APE is
    resolution-locked — a documented reference constraint: changing
    patch_process_shape invalidates fusion checkpoints).
    """
    embed_dim: int
    window: int
    num_heads: int
    depth: int
    num_patches: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        assert h * w == self.num_patches, (
            f"G2L APE is sized for {self.num_patches} patches, got {h}x{w}")
        tokens = x.reshape(b, h * w, c)
        ape = self.param("absolute_pos_embed", nn.initializers.normal(0.02),
                         (1, self.num_patches, self.embed_dim))
        tokens = tokens + ape.astype(tokens.dtype)
        for i in range(self.depth):
            shift = 0 if i % 2 == 0 else self.window // 2
            tokens = SwinBlock(self.embed_dim, self.num_heads, self.window,
                               shift, dtype=self.dtype,
                               name=f"block_{i}")(tokens, h, w)
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name="norm")(tokens)
        return tokens.reshape(b, h, w, c)
