"""Stitch + scheduling residual breakdown (VERDICT r4 #2, second half).

The round-3 stage table attributes ~76 ms/img of the p49 program to
"stitch+sched residual" (whole program 2202 ms minus coarse 17.2, chunks
3x686, remainder 46.8, crop+resize 4.3). This tool measures the stitch
chain's actual device cost at exact p49 shapes — per-pass paste_grid of
(n,392,518) tiles onto the (1568,2072) reensemble canvas, the blur-mask
multiplies, the AvgMap updates, and the final average — so the residual can
be split into "stitch compute" vs "XLA scheduling/concat overhead between
the chunked stages".

Usage: python tools/profile_stitch.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tools._bench_util import device_time
    from patchfusion_tpu.models.patchfusion import TileConfig
    from patchfusion_tpu.ops.masks import blend_mask
    from patchfusion_tpu.ops.stitch import AvgMap, paste_grid

    tc = TileConfig(image_raw_shape=(2160, 3840), patch_split_num=(4, 4),
                    patch_process_shape=(392, 518))
    offsets = [((0, 0), (0, 0))]
    prh, prw = tc.patch_raw_shape
    pph, ppw = tc.patch_process_shape
    offsets += [((0, prw // 2), (0, ppw // 2)),
                ((prh // 2, 0), (pph // 2, 0)),
                ((prh // 2, prw // 2), (pph // 2, ppw // 2))]
    pass_grids = [tc.regular_origins(off_raw) for (off_raw, _) in offsets]
    counts = [len(oh) * len(ow) for (oh, ow) in pass_grids]
    n_all = sum(counts)
    print(f"pass tile counts: {counts} (total {n_all})", flush=True)

    blur = jnp.asarray(blend_mask(tc.patch_process_shape))
    rng = np.random.default_rng(0)
    tiles_all = jax.device_put(
        rng.standard_normal((n_all, pph, ppw), np.float32)
        .astype(np.float32))

    def stitch(tiles_all):
        avg = None
        start = 0
        for (off_raw, off_proc), (oh, ow), n in zip(offsets, pass_grids,
                                                    counts):
            poh, pow_ = tc.process_origins(off_proc)
            tiles = tiles_all[start:start + n]
            start += n
            num = paste_grid(tiles * blur, poh, pow_,
                             tc.patch_reensemble_shape)
            den = paste_grid(jnp.broadcast_to(blur, tiles.shape), poh, pow_,
                             tc.patch_reensemble_shape)
            avg = AvgMap.init(num, den) if avg is None \
                else avg.update(num, den)
        return avg.average

    t = device_time(stitch, (tiles_all,), inner=20)
    print(f"full 4-pass stitch chain      {t * 1e3:8.3f} ms", flush=True)

    # one pass in isolation (16-tile grid)
    def one_pass(tiles):
        poh, pow_ = tc.process_origins((0, 0))
        num = paste_grid(tiles * blur, poh, pow_, tc.patch_reensemble_shape)
        den = paste_grid(jnp.broadcast_to(blur, tiles.shape), poh, pow_,
                         tc.patch_reensemble_shape)
        return num, den

    t1 = device_time(one_pass, (tiles_all[:16],), inner=20)
    print(f"single 16-tile paste pass     {t1 * 1e3:8.3f} ms", flush=True)

    # the concat the chunked runner pays to join chunk outputs (48 + 1)
    a = jax.device_put(rng.standard_normal((48, pph, ppw), np.float32))
    b = jax.device_put(rng.standard_normal((1, pph, ppw), np.float32))
    t2 = device_time(lambda x, y: jnp.concatenate([x, y], 0), (a, b),
                     inner=20)
    print(f"chunk-output concat (48+1)    {t2 * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
