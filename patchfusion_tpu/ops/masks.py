"""Gaussian tile-blending mask, bit-matching the reference `generatemask`.

Reference estimator/models/utils.py:38-47: an inset box of ones blurred with
`cv2.GaussianBlur(k, sigma)` (sigma = size[0]//16, k = 2*ceil(2*sigma)+1,
BORDER_REFLECT_101), then min-max normalised. This is a one-time host-side
constant — we reproduce OpenCV's separable Gaussian in numpy so the result is
identical without a cv2 runtime dependency on device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np


def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel: exp(-(i-c)^2 / (2 sigma^2)) normalised.

    OpenCV uses sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8 when sigma <= 0; here
    sigma is always positive (size[0]//16 >= 1 for any size >= 16).
    """
    c = (ksize - 1) / 2.0
    i = np.arange(ksize, dtype=np.float64)
    k = np.exp(-((i - c) ** 2) / (2.0 * sigma * sigma))
    return k / k.sum()


def _reflect101_pad(x: np.ndarray, pad: int, axis: int) -> np.ndarray:
    return np.pad(x, [(pad, pad) if a == axis else (0, 0)
                      for a in range(x.ndim)], mode="reflect")


@functools.lru_cache(maxsize=None)
def generatemask(size: Tuple[int, int]) -> np.ndarray:
    """Gaussian blend mask in [0, 1], shape `size`, float32.

    Matches reference models/utils.py:38-47 (cv2.GaussianBlur with
    BORDER_REFLECT_101 == numpy 'reflect').
    """
    h, w = size
    mask = np.zeros((h, w), np.float64)
    sigma = int(h / 16)
    k_size = int(2 * np.ceil(2 * int(h / 16)) + 1)
    mask[int(0.1 * h):h - int(0.1 * h), int(0.1 * w):w - int(0.1 * w)] = 1.0
    kern = _gaussian_kernel1d(k_size, sigma)
    pad = k_size // 2
    m = _reflect101_pad(mask, pad, 0)
    m = np.apply_along_axis(lambda v: np.convolve(v, kern, "valid"), 0, m)
    m = _reflect101_pad(m, pad, 1)
    m = np.apply_along_axis(lambda v: np.convolve(v, kern, "valid"), 1, m)
    m = (m - m.min()) / (m.max() - m.min())
    return m.astype(np.float32)


def blend_mask(size: Tuple[int, int], eps: float = 1e-3) -> np.ndarray:
    """`generatemask(size) + 1e-3` — the exact blend weights used at
    reference patchfusion.py:415 / baseline_pretrain.py:377."""
    return generatemask(size) + np.float32(eps)
