"""ROI-align as separable 1-D interpolations (TPU-native).

Replaces the reference's `torchvision.ops.roi_align(..., aligned=True)`
(7 call sites on the hot path: reference estimator/models/patchfusion.py:
232,235,247,251 and estimator/models/blocks/guided_fusion_model.py:202).

Because every PatchFusion ROI is an axis-aligned box, bilinear ROI sampling
separates into one 1-D interpolation along H and one along W. The grid=1
hot path is a 2-tap gather+lerp per axis (memory-bound VPU work); regular
tile passes further specialize to STATIC taps (grid_axis_plan /
roi_align_grid — the tiles' samples form one uniform grid over the feature
map). The general sampling_ratio>1 case falls back to dense per-box weight
matrices contracted on the MXU. Two batching modes:

  * `roi_align_single`: N boxes sampled from ONE feature map (the tiled
    inference path). The reference materialises the whole-image features
    repeated N times (patchfusion.py:246,250 — memory-hungry); here the
    feature map is read once.
  * `roi_align_batched`: box i samples feature map i (the training path,
    boxes carry batch indices aligned with the batch).

Semantics match torchvision `aligned=True`, `sampling_ratio=-1` (adaptive):
  roi_start = coord * spatial_scale - 0.5
  grid      = ceil(roi_size / out_size) samples per bin   (static given the
              tile geometry: all PatchFusion boxes share one size)
  sample s  : y = roi_start + (s + 0.5) * roi_size / (out * grid)
  bilinear with zero outside [-1, size] and index clamping, then bin-average.

The adaptive grid count depends only on the ROI *size*; PatchFusion boxes all
have identical size per call (patch_raw_shape scaled), so `grid` is a
compile-time constant. For safety we take the max over boxes at trace time
when sizes are static, else callers pass `sampling_ratio` explicitly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _axis_weights(start: Array, size: Array, out: int, grid: int,
                  in_size: int) -> Array:
    """Per-box 1-D ROI interpolation matrix, already bin-averaged.

    Args:
      start: (N,) roi start coordinate (already *scale - 0.5, aligned=True).
      size:  (N,) roi extent in feature coords.
      out:   output bins (static).
      grid:  samples per bin (static).
      in_size: input extent (static).
    Returns:
      (N, out, in_size) weights. Row o of box n sums to 1 unless all of the
      bin's samples fall outside [-1, in_size] (torchvision zeros those).
    """
    n = start.shape[0]
    s = jnp.arange(out * grid, dtype=jnp.float32)  # sample index
    # (N, out*grid) sample coordinates
    coord = start[:, None] + (s[None, :] + 0.5) * (size[:, None] /
                                                   (out * grid))
    # torchvision: samples with coord < -1 or > in_size contribute zero;
    # otherwise coord is clamped to [0, in_size-1] (its low/high index clamp
    # is equivalent to coordinate clamping for linear weights).
    valid = (coord >= -1.0) & (coord <= in_size)
    cc = jnp.clip(coord, 0.0, in_size - 1)
    idx = jnp.arange(in_size, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(cc[..., None] - idx[None, None, :]))
    w = jnp.where(valid[..., None], w, 0.0)
    # average the `grid` samples of each bin
    w = w.reshape(n, out, grid, in_size).mean(axis=2)
    return w


def _grid_count(roi_extent: float, out: int) -> int:
    return max(1, int(np.ceil(roi_extent / out)))


def _tap_coords(start: Array, size: Array, out: int, in_size: int):
    """(coords (N, out), valid (N, out)) for grid=1 sampling: one sample at
    each bin center, torchvision boundary rules."""
    s = jnp.arange(out, dtype=jnp.float32)
    coord = start[:, None] + (s[None, :] + 0.5) * (size[:, None] / out)
    valid = (coord >= -1.0) & (coord <= in_size)
    cc = jnp.clip(coord, 0.0, in_size - 1)
    return cc, valid


def _lerp_axis_single(x: Array, coords: Array, valid: Array,
                      axis_is_w: bool) -> Array:
    """2-tap gather+lerp along H (axis_is_w=False: x (H,W,C) shared across
    boxes -> (N,out,W,C)) or along W (x (N,out_h,W,C) -> (N,out_h,out,C))."""
    i0 = jnp.floor(coords).astype(jnp.int32)
    in_size = x.shape[2 if axis_is_w else 0]
    i0 = jnp.clip(i0, 0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    t = (coords - i0)[..., None]
    if not axis_is_w:
        n, out = coords.shape
        g0 = jnp.take(x, i0.reshape(-1), axis=0).reshape(
            n, out, *x.shape[1:])
        g1 = jnp.take(x, i1.reshape(-1), axis=0).reshape(
            n, out, *x.shape[1:])
        t = t[..., None]
        v = valid[..., None, None]
    else:
        idx0 = i0[:, None, :, None]
        idx1 = i1[:, None, :, None]
        g0 = jnp.take_along_axis(x, idx0, axis=2)
        g1 = jnp.take_along_axis(x, idx1, axis=2)
        t = t[:, None, :, :]
        v = valid[:, None, :, None]
    out = g0 * (1.0 - t) + g1 * t
    return jnp.where(v, out, 0.0)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w",
                                             "spatial_scale",
                                             "sampling_ratio"))
def roi_align_single(feat: Array, boxes: Array, out_h: int, out_w: int,
                     spatial_scale: float,
                     sampling_ratio: Optional[int] = None) -> Array:
    """ROI-align N boxes from one NHWC feature map (batch dim absent or 1).

    Args:
      feat: (H, W, C) or (1, H, W, C).
      boxes: (N, 4) [x1, y1, x2, y2] in pre-scale coordinates (the reference
        feeds process-space bboxs_feat; spatial_scale maps them to this
        level's feature grid).
      out_h/out_w: output spatial size (static).
      spatial_scale: torchvision spatial_scale.
      sampling_ratio: samples per bin; None = adaptive (requires concrete
        box sizes at trace time or identical-size boxes; PatchFusion always
        uses identical-size boxes so callers pass the static value).
    Returns:
      (N, out_h, out_w, C)
    """
    if feat.ndim == 4:
        feat = feat[0]
    h, w, _ = feat.shape
    x1 = boxes[:, 0] * spatial_scale - 0.5
    y1 = boxes[:, 1] * spatial_scale - 0.5
    x2 = boxes[:, 2] * spatial_scale - 0.5
    y2 = boxes[:, 3] * spatial_scale - 0.5
    roi_w = x2 - x1
    roi_h = y2 - y1
    if sampling_ratio is None:
        raise ValueError("pass a static sampling_ratio (PatchFusion boxes "
                         "share one size; grid = ceil(roi/out))")
    if int(sampling_ratio) == 1:
        if feat.dtype == jnp.bfloat16:
            # bf16 hot path: per-box banded weight matrices contracted on
            # the MXU (f32 accumulation). Dynamic-index gathers from traced
            # box coords serialize on TPU; the dense contraction streams —
            # same tradeoff as ops/resize.py's dense path, same sampling
            # arithmetic as the taps (weights built by _axis_weights with
            # grid=1 are exactly the 2-tap hat weights).
            wy = _axis_weights(y1, roi_h, out_h, 1, h).astype(jnp.bfloat16)
            wx = _axis_weights(x1, roi_w, out_w, 1, w).astype(jnp.bfloat16)
            out = jnp.einsum("nph,hwc->npwc", wy, feat,
                             preferred_element_type=jnp.float32)
            out = jnp.einsum("npwc,nqw->npqc", out.astype(jnp.bfloat16), wx,
                             preferred_element_type=jnp.float32)
            return out.astype(feat.dtype)
        # f32: 2-tap gather+lerp, bit-matching torchvision's arithmetic
        f32 = feat.astype(jnp.float32)
        cy, vy = _tap_coords(y1, roi_h, out_h, h)
        rows = _lerp_axis_single(f32, cy, vy, axis_is_w=False)
        cx, vx = _tap_coords(x1, roi_w, out_w, w)
        out = _lerp_axis_single(rows, cx, vx, axis_is_w=True)
        return out.astype(feat.dtype)
    gh = gw = int(sampling_ratio)
    wy = _axis_weights(y1, roi_h, out_h, gh, h)  # (N, out_h, H)
    wx = _axis_weights(x1, roi_w, out_w, gw, w)  # (N, out_w, W)
    f32 = feat.astype(jnp.float32)
    out = jnp.einsum("nph,hwc,nqw->npqc", wy, f32, wx,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(feat.dtype)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w",
                                             "spatial_scale",
                                             "sampling_ratio"))
def roi_align_batched(feat: Array, boxes: Array, out_h: int, out_w: int,
                      spatial_scale: float,
                      sampling_ratio: Optional[int] = None) -> Array:
    """ROI-align where box i samples feature map i (training path).

    Args:
      feat: (N, H, W, C).
      boxes: (N, 4) [x1, y1, x2, y2] (batch index column already dropped —
        the reference's bboxs_feat[:, 0] is arange(N) in training,
        patchfusion.py:379-380).
    Returns: (N, out_h, out_w, C)
    """
    h, w = feat.shape[1], feat.shape[2]
    x1 = boxes[:, 0] * spatial_scale - 0.5
    y1 = boxes[:, 1] * spatial_scale - 0.5
    roi_w = (boxes[:, 2] - boxes[:, 0]) * spatial_scale
    roi_h = (boxes[:, 3] - boxes[:, 1]) * spatial_scale
    if sampling_ratio is None:
        raise ValueError("pass a static sampling_ratio")
    if int(sampling_ratio) == 1:
        if feat.dtype == jnp.bfloat16:
            # bf16 hot path: banded-matrix MXU contraction (see
            # roi_align_single)
            wy = _axis_weights(y1, roi_h, out_h, 1, h).astype(jnp.bfloat16)
            wx = _axis_weights(x1, roi_w, out_w, 1, w).astype(jnp.bfloat16)
            out = jnp.einsum("nph,nhwc->npwc", wy, feat,
                             preferred_element_type=jnp.float32)
            out = jnp.einsum("npwc,nqw->npqc", out.astype(jnp.bfloat16), wx,
                             preferred_element_type=jnp.float32)
            return out.astype(feat.dtype)
        f32 = feat.astype(jnp.float32)
        cy, vy = _tap_coords(y1, roi_h, out_h, h)
        i0 = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, h - 1)
        i1 = jnp.minimum(i0 + 1, h - 1)
        t = (cy - i0)[:, :, None, None]
        g0 = jnp.take_along_axis(f32, i0[:, :, None, None], axis=1)
        g1 = jnp.take_along_axis(f32, i1[:, :, None, None], axis=1)
        rows = jnp.where(vy[:, :, None, None],
                         g0 * (1.0 - t) + g1 * t, 0.0)
        cx, vx = _tap_coords(x1, roi_w, out_w, w)
        out = _lerp_axis_single(rows, cx, vx, axis_is_w=True)
        return out.astype(feat.dtype)
    g = int(sampling_ratio)
    wy = _axis_weights(y1, roi_h, out_h, g, h)
    wx = _axis_weights(x1, roi_w, out_w, g, w)
    f32 = feat.astype(jnp.float32)
    out = jnp.einsum("nph,nhwc,nqw->npqc", wy, f32, wx,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(feat.dtype)


def adaptive_sampling_ratio(patch_extent_feat: float, out_size: int) -> int:
    """torchvision's adaptive grid count for a known static ROI extent."""
    return _grid_count(patch_extent_feat, out_size)


# ---------------------------------------------------------------------------
# Static-grid specialization (regular tile passes)
# ---------------------------------------------------------------------------

def grid_axis_plan(origins, extent: float, out: int, in_size: int):
    """Static 2-tap plan for a regular pass along one axis.

    For regular tile grids the ROI sample positions of ALL tiles form one
    uniform grid over the whole feature map, so roi_align collapses to a
    static-index gather+lerp (XLA lowers constant-index gathers to cheap
    slices — no dynamic-gather penalty). Arithmetic mirrors _tap_coords in
    float32 so results match the dynamic path bit-for-bit.

    Args:
      origins: static per-tile start coordinates in feature space
        (origin_raw * raw_to_process * spatial_scale), Python floats.
      extent: static ROI extent in feature coords.
      out: output bins per tile.
    Returns: (i0 (T*out,), i1, w (T*out,) f32) numpy arrays.
    """
    coords = []
    s = np.arange(out, dtype=np.float32)
    for o in origins:
        start = np.float32(o) - np.float32(0.5)
        coords.append(start + (s + np.float32(0.5))
                      * (np.float32(extent) / np.float32(out)))
    c = np.concatenate(coords)
    c = np.clip(c, 0.0, in_size - 1)
    i0 = np.clip(np.floor(c).astype(np.int32), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w = (c - i0).astype(np.float32)
    return i0, i1, w


def roi_align_grid(feat: Array, plan_y, plan_x, n_y: int, n_x: int,
                   out_h: int, out_w: int) -> Array:
    """roi_align for a regular pass with static tap plans.

    feat: (H, W, C) or (1, H, W, C). Returns (n_y*n_x, out_h, out_w, C) in
    row-major tile order (matching the reference's nested h/w loop)."""
    if feat.ndim == 4:
        feat = feat[0]
    work = feat if feat.dtype == jnp.bfloat16 else feat.astype(jnp.float32)
    i0y, i1y, wy = plan_y
    i0x, i1x, wx = plan_x
    wdt = work.dtype
    rows = (jnp.take(work, jnp.asarray(i0y), axis=0)
            * jnp.asarray(1.0 - wy, wdt)[:, None, None]
            + jnp.take(work, jnp.asarray(i1y), axis=0)
            * jnp.asarray(wy, wdt)[:, None, None])
    cols = (jnp.take(rows, jnp.asarray(i0x), axis=1)
            * jnp.asarray(1.0 - wx, wdt)[None, :, None]
            + jnp.take(rows, jnp.asarray(i1x), axis=1)
            * jnp.asarray(wx, wdt)[None, :, None])
    c = cols.shape[-1]
    tiles = cols.reshape(n_y, out_h, n_x, out_w, c)
    tiles = tiles.transpose(0, 2, 1, 3, 4).reshape(n_y * n_x, out_h, out_w,
                                                   c)
    return tiles.astype(feat.dtype)
