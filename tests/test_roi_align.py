"""Golden tests for ops.roi_align vs a direct numpy port of the torchvision
`roi_align(aligned=True)` algorithm (torchvision itself is not installed in
this image; the numpy oracle follows the published CUDA/CPU kernel semantics
bin-for-bin)."""

import numpy as np
import pytest

from patchfusion_tpu.ops import (adaptive_sampling_ratio, roi_align_batched,
                                 roi_align_single)


def _bilinear(feat, y, x):
    """feat (H, W, C); zero outside [-1, size]; torchvision clamping."""
    h, w, _ = feat.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[-1], feat.dtype)
    y = min(max(y, 0.0), h - 1)
    x = min(max(x, 0.0), w - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return ((1 - ly) * (1 - lx) * feat[y0, x0] +
            (1 - ly) * lx * feat[y0, x1] +
            ly * (1 - lx) * feat[y1, x0] +
            ly * lx * feat[y1, x1])


def roi_align_numpy(feat, boxes, out_h, out_w, spatial_scale, sampling_ratio):
    """Oracle: feat (H, W, C), boxes (N, 4) xyxy, aligned=True."""
    n = boxes.shape[0]
    c = feat.shape[-1]
    out = np.zeros((n, out_h, out_w, c), np.float64)
    for bi in range(n):
        x1, y1, x2, y2 = boxes[bi] * spatial_scale
        x1, y1 = x1 - 0.5, y1 - 0.5
        x2, y2 = x2 - 0.5, y2 - 0.5
        roi_w, roi_h = x2 - x1, y2 - y1
        bin_w, bin_h = roi_w / out_w, roi_h / out_h
        g = sampling_ratio
        for ph in range(out_h):
            for pw in range(out_w):
                acc = np.zeros(c, np.float64)
                for iy in range(g):
                    yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / g
                    for ix in range(g):
                        xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / g
                        acc += _bilinear(feat, yy, xx)
                out[bi, ph, pw] = acc / (g * g)
    return out.astype(np.float32)


@pytest.mark.parametrize("level_hw,scale_den", [
    ((14, 19), 392), ((28, 37), 392), ((56, 74), 392)])
def test_roi_align_single_matches_oracle(rng, level_hw, scale_den):
    """The PatchFusion call pattern: whole-image feature, process-space boxes,
    output = full feature size, spatial_scale = h / patch_process_shape[0]
    (reference patchfusion.py:240-257, guided_fusion_model.py:202)."""
    h, w = level_hw
    feat = rng.standard_normal((h, w, 5), dtype=np.float32)
    # boxes in process coords: tiles of size (98, 129.5) at assorted offsets
    boxes = np.array([
        [0.0, 0.0, 129.5, 98.0],
        [129.5, 98.0, 259.0, 196.0],
        [64.75, 49.0, 194.25, 147.0],
        [388.5, 294.0, 518.0, 392.0],
    ], np.float32)
    scale = h / scale_den
    sr = adaptive_sampling_ratio(98.0 * scale, h)
    assert sr == 1
    ours = np.asarray(roi_align_single(feat, boxes, h, w, scale,
                                       sampling_ratio=sr))
    golden = roi_align_numpy(feat, boxes, h, w, scale, sr)
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=5e-5)


def test_roi_align_multi_sample_grid(rng):
    """Exercise grid > 1 (bins wider than one source pixel)."""
    feat = rng.standard_normal((32, 32, 2), dtype=np.float32)
    boxes = np.array([[1.0, 2.0, 30.0, 28.0], [0.0, 0.0, 16.0, 16.0]],
                     np.float32)
    ours = np.asarray(roi_align_single(feat, boxes, 8, 8, 1.0,
                                       sampling_ratio=4))
    golden = roi_align_numpy(feat, boxes, 8, 8, 1.0, 4)
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=5e-5)


def test_roi_align_batched_matches_oracle(rng):
    """Training path: box i samples feature i (patchfusion.py:227-237)."""
    feats = rng.standard_normal((3, 14, 19, 4), dtype=np.float32)
    boxes = np.array([
        [0.0, 0.0, 129.5, 98.0],
        [100.0, 50.0, 229.5, 148.0],
        [388.5, 294.0, 518.0, 392.0],
    ], np.float32)
    scale = 14 / 392
    ours = np.asarray(roi_align_batched(feats, boxes, 14, 19, scale,
                                        sampling_ratio=1))
    for i in range(3):
        golden = roi_align_numpy(feats[i], boxes[i:i + 1], 14, 19, scale, 1)
        np.testing.assert_allclose(ours[i:i + 1], golden, rtol=1e-4,
                                   atol=1e-5)
