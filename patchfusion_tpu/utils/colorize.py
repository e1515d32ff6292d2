"""Depth-map colorization (reference estimator/utils/color.py:95-158
colorize): percentile normalization + matplotlib colormap, invalid pixels
filled with a background color."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def colorize(value, vmin: Optional[float] = None,
             vmax: Optional[float] = None, cmap: str = "turbo_r",
             invalid_val: float = -99,
             invalid_mask: Optional[np.ndarray] = None,
             background_color: Tuple[int, ...] = (128, 128, 128, 255),
             gamma_corrected: bool = False, value_transform=None,
             vminp: float = 2, vmaxp: float = 95) -> np.ndarray:
    import matplotlib
    import matplotlib.cm

    value = np.asarray(value, np.float64).squeeze()
    if invalid_mask is None:
        invalid_mask = value == invalid_val
    mask = np.logical_not(invalid_mask)

    vmin = np.percentile(value[mask], vminp) if vmin is None else vmin
    vmax = np.percentile(value[mask], vmaxp) if vmax is None else vmax
    if vmin != vmax:
        value = (value - vmin) / (vmax - vmin)
    else:
        value = value * 0.0

    value[invalid_mask] = np.nan
    cmapper = matplotlib.colormaps.get_cmap(cmap)
    if value_transform:
        value = value_transform(value)
    img = cmapper(value, bytes=True)
    img[invalid_mask] = background_color
    if gamma_corrected:
        img = ((img / 255.0) ** 2.2 * 255).astype(np.uint8)
    return img


def colorize_infer_pfv1(value, cmap: str = "magma_r",
                        vmin: Optional[float] = None,
                        vmax: Optional[float] = None) -> np.ndarray:
    """Simple min-max colorization (reference color.py:8-25)."""
    import matplotlib

    value = np.asarray(value, np.float64).squeeze()
    vmin = value.min() if vmin is None else vmin
    vmax = value.max() if vmax is None else vmax
    if vmin != vmax:
        value = (value - vmin) / (vmax - vmin)
    else:
        value = value * 0.0
    cmapper = matplotlib.colormaps.get_cmap(cmap)
    return cmapper(value, bytes=True)


def colorize_rescale(value, vmin: Optional[float] = None,
                     vmax: Optional[float] = None, cmap: str = "turbo_r",
                     vminp: float = 2, vmaxp: float = 95,
                     rescale_vmin: Optional[float] = None,
                     rescale_vmax: Optional[float] = None) -> np.ndarray:
    """Percentile colorization against an external reference range
    (reference color.py:28-93, used to render side-by-side panels with a
    shared scale)."""
    import matplotlib

    value = np.asarray(value, np.float64).squeeze()
    vmin = np.percentile(value, vminp) if vmin is None else vmin
    vmax = np.percentile(value, vmaxp) if vmax is None else vmax
    if rescale_vmin is not None and rescale_vmax is not None:
        vmin, vmax = rescale_vmin, rescale_vmax
    if vmin != vmax:
        value = np.clip((value - vmin) / (vmax - vmin), 0, 1)
    else:
        value = value * 0.0
    cmapper = matplotlib.colormaps.get_cmap(cmap)
    return cmapper(value, bytes=True)


def save_depth_png(depth: np.ndarray, path_color: str,
                   path_uint16: Optional[str] = None,
                   gray_scale: bool = False) -> None:
    """The reference tester's artifact dump (tester.py:66-76): colorized PNG
    and uint16 depth*256 PNG."""
    from PIL import Image

    d = np.asarray(depth).squeeze()
    if gray_scale:
        img = (np.clip(d / max(d.max(), 1e-8), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(path_color)
    else:
        Image.fromarray(colorize(d)).save(path_color)
    if path_uint16:
        Image.fromarray((d * 256).astype(np.uint16)).save(path_uint16)
