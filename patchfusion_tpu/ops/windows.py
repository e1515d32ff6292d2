"""Swin window partition/reverse and shifted-window attention masks.

XLA-native reshapes/transposes (reference: estimator/models/blocks/
swin_layers.py:53-82 window_partition/window_reverse, and the attention mask
construction at swin_layers.py:325-345). All shapes static; the attention
mask is a pure function of (H, W, window, shift) and is precomputed in numpy
so it constant-folds into the compiled program.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def window_partition(x: Array, window: int) -> Array:
    """(B, H, W, C) -> (B * nH * nW, window, window, C). H, W % window == 0."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window, window, c)


def window_reverse(windows: Array, window: int, h: int, w: int) -> Array:
    """(B*nH*nW, window, window, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // window) * (w // window))
    x = windows.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=None)
def shifted_window_mask(hp: int, wp: int, window: int,
                        shift: int) -> np.ndarray:
    """(-100/0) additive attention mask, (nW, window^2, window^2).

    Identical construction to reference swin_layers.py:327-345: label the
    padded (hp, wp) canvas with 9 region ids induced by the cyclic shift,
    partition into windows, mask pairs with differing ids.
    """
    img_mask = np.zeros((hp, wp), np.float32)
    h_slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    w_slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img_mask[hs, ws] = cnt
            cnt += 1
    nh, nw = hp // window, wp // window
    m = img_mask.reshape(nh, window, nw, window).transpose(0, 2, 1, 3)
    m = m.reshape(nh * nw, window * window)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def pad_to_multiple(x: Array, window: int) -> Tuple[Array, int, int]:
    """Zero-pad H, W (axes -3, -2) up to multiples of `window`."""
    h, w = x.shape[-3], x.shape[-2]
    hp = -(-h // window) * window
    wp = -(-w // window) * window
    if hp == h and wp == w:
        return x, hp, wp
    pad = [(0, 0)] * x.ndim
    pad[-3] = (0, hp - h)
    pad[-2] = (0, wp - w)
    return jnp.pad(x, pad), hp, wp
