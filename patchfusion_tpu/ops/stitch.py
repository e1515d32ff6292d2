"""Tile → canvas stitching and the running weighted-average map.

Reference semantics (estimator/models/utils.py:21-36 RunningAverageMap,
baseline_pretrain.py:310-331 paste loops): each pass pastes
`depth_tile * blur_mask` and `blur_mask` into zero canvases, then performs a
running-average update per tile. The sequential per-tile update
    avg <- (pred + count*avg) / (count + ct);  count <- count + ct
composes additively, so an entire pass (even with overlapping random tiles)
is mathematically identical to ONE batched update with the summed pass
canvases. We exploit that: a pass is a single scatter + a single update —
no Python-driven device loop.

Regular passes place tiles on a static grid: the scatter is a free
reshape/pad. Random passes use dynamic_update_slice accumulation.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from patchfusion_tpu.ops.resize import interpolate

Array = jax.Array


class AvgMap(NamedTuple):
    """Functional RunningAverageMap (reference models/utils.py:21-36)."""
    average: Array  # (H, W)
    count: Array    # (H, W)

    @staticmethod
    def init(pred: Array, count: Array) -> "AvgMap":
        return AvgMap(pred / count, count)

    def update(self, pred: Array, ct: Array) -> "AvgMap":
        new_avg = (pred + self.count * self.average) / (self.count + ct)
        return AvgMap(new_avg, self.count + ct)

    def resize(self, size: Tuple[int, int]) -> "AvgMap":
        """rN-mode move to raw resolution (reference models/utils.py:32-36:
        average map resized NEAREST — torch F.interpolate default — count map
        bilinear align_corners=True)."""
        avg = interpolate(self.average[None, :, :, None], size,
                          mode="nearest")[0, :, :, 0]
        cnt = interpolate(self.count[None, :, :, None], size,
                          mode="bilinear", align_corners=True)[0, :, :, 0]
        return AvgMap(avg, cnt)


def paste_grid(tiles: Array, origins_h: Sequence[int],
               origins_w: Sequence[int], canvas_hw: Tuple[int, int]) -> Array:
    """Paste (len(oh)*len(ow), th, tw) tiles onto a zero canvas at the static
    regular grid (row-major order, matching the reference's nested h/w loop
    at baseline_pretrain.py:311-326). Tiles within a pass never overlap.
    """
    nh, nw = len(origins_h), len(origins_w)
    th, tw = tiles.shape[-2], tiles.shape[-1]
    ch, cw = canvas_hw
    # contiguous grid → reshape; then pad to the canvas at the offset
    block = tiles.reshape(nh, nw, th, tw).transpose(0, 2, 1, 3)
    block = block.reshape(nh * th, nw * tw)
    oh, ow = origins_h[0], origins_w[0]
    # regular grids are always contiguous: origins step == tile size
    pad_top, pad_left = oh, ow
    pad_bot = ch - (oh + nh * th)
    pad_right = cw - (ow + nw * tw)
    assert pad_bot >= 0 and pad_right >= 0, "grid exceeds canvas"
    return jnp.pad(block, ((pad_top, pad_bot), (pad_left, pad_right)))


def paste_dynamic(tiles: Array, origins_hw: Array,
                  canvas_hw: Tuple[int, int]) -> Array:
    """Accumulate (N, th, tw) tiles at dynamic integer origins (N, 2) onto a
    zero canvas, summing overlaps (random-tile passes)."""
    th, tw = tiles.shape[-2], tiles.shape[-1]

    def body(canvas, inp):
        tile, oy, ox = inp
        patch = jax.lax.dynamic_slice(canvas, (oy, ox), (th, tw))
        return jax.lax.dynamic_update_slice(canvas, patch + tile,
                                            (oy, ox)), None

    canvas = jnp.zeros(canvas_hw, tiles.dtype)
    canvas, _ = jax.lax.scan(
        body, canvas, (tiles, origins_hw[:, 0], origins_hw[:, 1]))
    return canvas
