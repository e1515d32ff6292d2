"""Tests for the Gaussian blend mask (vs cv2 golden) and stitching algebra
(vs the reference's sequential RunningAverageMap updates)."""

import numpy as np
import pytest

from patchfusion_tpu.ops import AvgMap, blend_mask, generatemask, paste_grid
from patchfusion_tpu.ops.stitch import paste_dynamic


def test_generatemask_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    for size in [(392, 518), (384, 512), (540, 960)]:
        h, w = size
        mask = np.zeros(size, dtype=np.float32)
        sigma = int(h / 16)
        k = int(2 * np.ceil(2 * int(h / 16)) + 1)
        mask[int(0.1 * h):h - int(0.1 * h), int(0.1 * w):w - int(0.1 * w)] = 1
        g = cv2.GaussianBlur(mask, (k, k), sigma)
        g = (g - g.min()) / (g.max() - g.min())
        ours = generatemask(size)
        np.testing.assert_allclose(ours, g, atol=2e-6)


def test_blend_mask_offset():
    m = blend_mask((392, 518))
    assert m.min() >= 1e-3 - 1e-9
    assert abs(m.max() - (1 + 1e-3)) < 1e-6


def test_paste_grid_matches_loop(rng):
    tiles = rng.standard_normal((6, 10, 20), dtype=np.float32)
    oh, ow = [5, 15], [0, 20, 40]
    canvas = np.zeros((30, 70), np.float32)
    k = 0
    for y in oh:
        for x in ow:
            canvas[y:y + 10, x:x + 20] = tiles[k]
            k += 1
    ours = np.asarray(paste_grid(tiles, oh, ow, (30, 70)))
    np.testing.assert_array_equal(ours, canvas)


def test_avgmap_batched_update_equals_sequential(rng):
    """One batched pass update == the reference's per-tile sequential updates
    (models/utils.py:28-30), including overlapping random tiles."""
    h, w = 24, 24
    base_pred = rng.random((h, w), dtype=np.float32) + 0.5
    base_count = rng.random((h, w), dtype=np.float32) + 0.5
    # sequential reference
    avg = base_pred / base_count
    cnt = base_count.copy()
    tiles = [(0, 0), (4, 4), (2, 2), (10, 10)]  # overlapping
    tp, tc = [], []
    for (y, x) in tiles:
        p = np.zeros((h, w), np.float32)
        c = np.zeros((h, w), np.float32)
        val = rng.random((8, 8), dtype=np.float32)
        msk = rng.random((8, 8), dtype=np.float32) + 0.1
        p[y:y + 8, x:x + 8] = val * msk
        c[y:y + 8, x:x + 8] = msk
        avg = (p + cnt * avg) / (cnt + c)
        cnt = cnt + c
        tp.append(p)
        tc.append(c)
    # batched
    m = AvgMap.init(np.asarray(base_pred), np.asarray(base_count))
    m = m.update(np.sum(tp, axis=0), np.sum(tc, axis=0))
    np.testing.assert_allclose(np.asarray(m.average), avg, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(m.count), cnt, rtol=2e-5)


def test_paste_dynamic_sums_overlaps(rng):
    tiles = rng.standard_normal((3, 4, 4), dtype=np.float32)
    origins = np.array([[0, 0], [2, 2], [0, 0]], np.int32)
    out = np.asarray(paste_dynamic(tiles, origins, (8, 8)))
    ref = np.zeros((8, 8), np.float32)
    for t, (y, x) in zip(tiles, origins):
        ref[y:y + 4, x:x + 4] += t
    np.testing.assert_allclose(out, ref, rtol=1e-6)
