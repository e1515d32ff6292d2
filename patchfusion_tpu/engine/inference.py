"""Tiled 4K inference engine: one compiled XLA program per cai mode.

Re-design of the reference hot path (estimator/models/patchfusion.py:401-453
+ baseline_pretrain.py:143-331). The reference drives tiling with Python
loops of device ops (per-tile crop/resize bp:258-267, per-chunk forward
bp:293-307, per-tile canvas pastes bp:310-326). Here the whole m1/m2/rN
inference for a fixed (image_raw_shape, patch_split_num, cai_mode) bucket is
ONE jitted function:

  * tile crops = vmap(dynamic_slice) + batched matmul resize;
  * fine+fusion runs over the tile batch, optionally chunked with `lax.map`
    (`process_num` tiles per step — the reference's chunking knob, now a
    memory/throughput tradeoff instead of a Python loop);
  * stitching = reshape-paste per regular pass + a single running-average
    update (mathematically identical to the reference's sequential per-tile
    updates — see ops/stitch.py);
  * random (rN) tiles arrive as data (origins array), so each (mode, n)
    bucket compiles once and reruns for any random draw.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from patchfusion_tpu.models.patchfusion import PatchFusionNet, TileConfig
from patchfusion_tpu.ops.masks import blend_mask
from patchfusion_tpu.ops.resize import interpolate
from patchfusion_tpu.ops.stitch import AvgMap, paste_dynamic, paste_grid

Array = jax.Array


def crop_resize_tiles(image_hr: Array, origins: Array,
                      patch_raw: Tuple[int, int],
                      process_shape: Tuple[int, int],
                      compute_dtype: Any = jnp.float32) -> Array:
    """Batched crop + resize: (H,W,3) + (N,2)[y,x] -> (N,ph,pw,3).

    Replaces the reference's per-tile Python loop (baseline_pretrain.py:
    258-267); the resize matches the reference `Resize` transform (bilinear,
    align_corners=True — ops/resize.py NetResizer semantics for the shipped
    no-aspect-ratio configs)."""
    th, tw = patch_raw

    def one(origin):
        return jax.lax.dynamic_slice(image_hr, (origin[0], origin[1], 0),
                                     (th, tw, image_hr.shape[-1]))

    crops = jax.vmap(one)(origins)
    if crops.dtype == jnp.float32 and compute_dtype == jnp.bfloat16:
        # every consumer (both branches' first convs, the fusion U-Net
        # input) immediately casts to bf16 — resizing in bf16 rides the
        # dense MXU path (ops/resize.py) and is within the bf16 compute
        # contract. Gated on the MODEL's compute dtype (not the backend) so
        # a deliberate f32-on-TPU run keeps the exact tap path.
        crops = crops.astype(jnp.bfloat16)
    return interpolate(crops, process_shape, mode="bilinear",
                       align_corners=True)


def _chunked(fn, arrays: Sequence[Array], chunk: Optional[int],
             policy: str = "greedy") -> Array:
    """Apply fn over the leading (tile) axis in chunks via lax.map (the XLA
    replacement for the reference's torch.split loop,
    baseline_pretrain.py:293-307). `chunk` is a memory cap; no tile is ever
    padded or recomputed.

    policy="greedy" (default): full `chunk`-sized lax.map steps + one
    remainder call — fastest at runtime (measured: full-size chunks beat
    divisor chunks and beat absorbing the remainder into an oversized
    tail), but the remainder is a SECOND compiled copy of fn's body.
    policy="divisor": largest divisor of n that is <= chunk — one body,
    ~2/3 the compile time of a p49 bucket at ~9% runtime cost (see
    tools/profile_compile.py)."""
    n = arrays[0].shape[0]
    if chunk is None or chunk >= n:
        return fn(*arrays)
    if policy == "divisor":
        chunk = max(d for d in range(1, chunk + 1) if n % d == 0)
    main = (n // chunk) * chunk
    outs = []
    if main:
        stacked = [a[:main].reshape(-1, chunk, *a.shape[1:])
                   for a in arrays]
        o = jax.lax.map(lambda xs: fn(*xs), tuple(stacked))
        outs.append(o.reshape(-1, *o.shape[2:]))
    if n - main:
        outs.append(fn(*[a[main:] for a in arrays]))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


class PatchFusionInference:
    """Compiled tiled inference for PatchFusion / fine-only / coarse-only.

    Modes (reference docs/user_infer.md:4-37, patchfusion.py:401-453):
      m1: one pass of P*Q tiles;  m2: + 3 half-tile-shifted passes;
      rN ("r128"...): m2 + N random tiles blended at raw resolution.
    """

    def __init__(self, net: PatchFusionNet, variables: Dict[str, Any],
                 tile_cfg: TileConfig, process_num: Optional[int] = 4,
                 fusion: bool = True, mesh=None, patch_axis: str = "patch",
                 rn_times_process_num: bool = False,
                 chunk_policy: str = "greedy"):
        """mesh: optional jax.sharding.Mesh with a `patch_axis` — the tile
        batch of every pass is sharded over it (ICI tile parallelism, the
        multi-chip replacement for the reference's process_num chunk loop).
        With a mesh, process_num chunking is disabled (the shard IS the
        chunk)."""
        self.net = net
        self.variables = variables
        self.tile_cfg = tile_cfg
        self.process_num = None if mesh is not None else process_num
        self.fusion = fusion
        self.mesh = mesh
        self.patch_axis = patch_axis
        # rN tiles are generated/processed in groups of this size: the
        # reference's process_num batching on one chip, the device count
        # under a mesh (each group shards one tile per device)
        self.tile_group = (int(mesh.shape[patch_axis]) if mesh is not None
                           else process_num)
        self.rn_times_process_num = rn_times_process_num
        # "greedy" (fastest) or "divisor" (single compiled chunk body)
        self.chunk_policy = chunk_policy
        self._compiled: Dict[Any, Any] = {}

    def _shard_tiles(self, x: Array) -> Array:
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        n = x.shape[0]
        ndev = self.mesh.shape[self.patch_axis]
        spec = P(self.patch_axis) if n % ndev == 0 else P()
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    def _pad_tiles(self, arrays, n: int):
        """Pad the tile axis to a device multiple so every pass shards over
        the patch axis (a 49-tile p49 stream on 8 chips runs as 56 with the
        7 duplicates dropped). Returns (padded arrays, n)."""
        if self.mesh is None:
            return arrays, n
        ndev = self.mesh.shape[self.patch_axis]
        pad = (-n) % ndev
        if pad == 0:
            return arrays, n
        return [jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)],
                                axis=0) for a in arrays], n

    # -- internals -----------------------------------------------------------

    def _grid_rois(self, feats, oh_raw, ow_raw):
        """Static-grid roi_align for a regular pass: the tiles' sample
        positions form one uniform grid, so each level is a static-tap
        gather+lerp over the whole feature (no dynamic-gather penalty).
        Numerically identical to the dynamic per-box path."""
        from patchfusion_tpu.ops.roi_align import (grid_axis_plan,
                                                   roi_align_grid)
        tc = self.tile_cfg
        fy = np.float32(tc.patch_process_shape[0] / tc.image_raw_shape[0])
        fx = np.float32(tc.patch_process_shape[1] / tc.image_raw_shape[1])
        outs = []
        for f in feats:
            h, w = f.shape[-3], f.shape[-2]
            ss = np.float32(h / tc.patch_process_shape[0])
            oy = [np.float32(np.float32(y) * fy) * ss for y in oh_raw]
            ox = [np.float32(np.float32(x) * fx) * ss for x in ow_raw]
            ey = np.float32(tc.patch_raw_shape[0]) * fy * ss
            ex = np.float32(tc.patch_raw_shape[1]) * fx * ss
            plan_y = grid_axis_plan(oy, ey, h, h)
            plan_x = grid_axis_plan(ox, ex, w, w)
            outs.append(roi_align_grid(f, plan_y, plan_x, len(oh_raw),
                                       len(ow_raw), h, w))
        return outs

    def _tile_batch(self, variables, image_hr, origins_raw: Array,
                    boxes_process: Optional[Array], coarse_ctx,
                    static_grids=None) -> Array:
        """Run fine(+fusion) on a batch of tiles -> (N, ph, pw).
        static_grids: list of (oh, ow) regular grids covering origins_raw in
        order (static-tap roi path); None -> dynamic boxes_process path."""
        tc = self.tile_cfg
        n_tiles = origins_raw.shape[0]
        crops = crop_resize_tiles(image_hr, origins_raw, tc.patch_raw_shape,
                                  tc.patch_process_shape,
                                  compute_dtype=self.net.dtype)
        if not self.fusion:
            (crops,), n_tiles = self._pad_tiles([crops], n_tiles)
            crops = self._shard_tiles(crops)

            def run(crop_chunk):
                depth, _ = self.net.apply(
                    variables, crop_chunk,
                    method=PatchFusionNet.fine_forward)
                return depth[..., 0]
            return _chunked(run, [crops], self.process_num,
                            self.chunk_policy)[:n_tiles]

        coarse_depth, coarse_feats, g2l_feats = coarse_ctx
        if self.process_num is not None and n_tiles > self.process_num:
            # chunk-local ROI: materializing the ROI pyramids for ALL tiles
            # up front costs multi-GB of live HBM at full tile counts (the
            # (49,224,296,C) levels alone are ~1.5 GB each) and caps the
            # chunk size the chip can hold. Gathering each chunk's ROIs
            # inside the lax.map body from the single whole-image feature
            # copy keeps only process_num tiles' features live — this is
            # what lets process_num=16 (the fastest measured chunk) fit.
            # The dynamic-box roi path is numerically identical to the
            # static-grid specialization (ops/roi_align.py).
            boxes_raw = jnp.concatenate([
                origins_raw[:, 1:2], origins_raw[:, 0:1],
                origins_raw[:, 1:2] + tc.patch_raw_shape[1],
                origins_raw[:, 0:1] + tc.patch_raw_shape[0]],
                axis=1).astype(jnp.float32)
            boxes_p = tc.bbox_to_process(boxes_raw)

            def run_local(crop_chunk, box_chunk):
                droi, frois, grois = self.net.apply(
                    variables, coarse_depth, coarse_feats, g2l_feats,
                    box_chunk, method=PatchFusionNet.coarse_postprocess)
                depth = self.net.apply(
                    variables, crop_chunk, frois, grois, droi,
                    method=PatchFusionNet.infer_tiles)
                return depth[..., 0]

            return _chunked(run_local, [crops, boxes_p],
                            self.process_num,
                            self.chunk_policy)[:n_tiles]

        if static_grids is not None:
            def cat_rois(feats):
                per_level = [self._grid_rois(feats, oh, ow)
                             for (oh, ow) in static_grids]
                return [jnp.concatenate([g[lvl] for g in per_level], axis=0)
                        for lvl in range(len(feats))]
            depth_roi = cat_rois([coarse_depth])[0]
            feat_rois = cat_rois(coarse_feats)
            g2l_rois = cat_rois(g2l_feats)
        else:
            depth_roi, feat_rois, g2l_rois = self.net.apply(
                variables, coarse_depth, coarse_feats, g2l_feats,
                boxes_process, method=PatchFusionNet.coarse_postprocess)

        arrays = [crops, depth_roi, *feat_rois, *g2l_rois]
        arrays, n_tiles = self._pad_tiles(arrays, n_tiles)
        arrays = [self._shard_tiles(a) for a in arrays]

        def run(crop_chunk, droi_chunk, *roi_chunks):
            frois = list(roi_chunks[:6])
            grois = list(roi_chunks[6:])
            depth = self.net.apply(
                variables, crop_chunk, frois, grois, droi_chunk,
                method=PatchFusionNet.infer_tiles)
            return depth[..., 0]

        return _chunked(run, arrays, self.process_num,
                        self.chunk_policy)[:n_tiles]

    def _coarse_ctx(self, variables, image_lr):
        if not self.fusion:
            # fine-only (BaselinePretrain) engines never consume the coarse
            # pass — skip it instead of computing and discarding it
            return None
        coarse_depth, coarse_feats = self.net.apply(
            variables, image_lr, method=PatchFusionNet.coarse_forward)
        g2l_feats = self.net.apply(variables, coarse_feats,
                                   method=PatchFusionNet.attend_coarse)
        return coarse_depth, coarse_feats, g2l_feats

    def _mode_plan(self, mode: str):
        """Static per-mode tiling plan: pass offsets, grids, blend masks."""
        tc = self.tile_cfg
        offsets = [((0, 0), (0, 0))]
        if mode in ("m2", "r"):
            prh, prw = tc.patch_raw_shape
            pph, ppw = tc.patch_process_shape
            offsets += [((0, prw // 2), (0, ppw // 2)),
                        ((prh // 2, 0), (pph // 2, 0)),
                        ((prh // 2, prw // 2), (pph // 2, ppw // 2))]
        pass_grids = [tc.regular_origins(off_raw) for (off_raw, _) in offsets]
        blur = jnp.asarray(blend_mask(tc.patch_process_shape))
        blur_raw = jnp.asarray(blend_mask(tc.patch_raw_shape))
        return offsets, pass_grids, blur, blur_raw

    def _image_stream(self, variables, image_hr, rand_origins, coarse_ctx,
                      mode: str, n_random: int, plan) -> Array:
        """Full tiled inference for ONE image given its coarse context —
        the body shared by the per-image and batched programs."""
        tc = self.tile_cfg
        pn = self.tile_group or 1
        offsets, pass_grids, blur, blur_raw = plan

        # batch ALL regular passes' tiles into one stream: a p49 run is
        # a single 49-tile batch (uniform divisor chunks, e.g. 7x7)
        # instead of per-pass fragments (8,8 | 6,6 | 6,6 | 3,3,3)
        counts = [len(oh) * len(ow) for (oh, ow) in pass_grids]
        all_origins = np.concatenate([
            np.array([[y, x] for y in oh for x in ow], np.int32)
            for (oh, ow) in pass_grids])
        tiles_all = self._tile_batch(
            variables, image_hr, jnp.asarray(all_origins), None,
            coarse_ctx, static_grids=pass_grids)

        avg: Optional[AvgMap] = None
        start = 0
        for (off_raw, off_proc), (oh, ow), n in zip(offsets, pass_grids,
                                                    counts):
            poh, pow_ = tc.process_origins(off_proc)
            tiles = tiles_all[start:start + n]
            start += n
            num = paste_grid(tiles * blur, poh, pow_,
                             tc.patch_reensemble_shape)
            den = paste_grid(jnp.broadcast_to(
                blur, tiles.shape), poh, pow_,
                tc.patch_reensemble_shape)
            if avg is None:
                avg = AvgMap.init(num, den)
            else:
                avg = avg.update(num, den)

        if mode == "r" and n_random > 0:
            avg = avg.resize(tc.image_raw_shape)
            groups = rand_origins.reshape(-1, pn, 2)

            def one_group(gorigins):
                boxes_raw = jnp.concatenate([
                    gorigins[:, 1:2], gorigins[:, 0:1],
                    gorigins[:, 1:2] + tc.patch_raw_shape[1],
                    gorigins[:, 0:1] + tc.patch_raw_shape[0]],
                    axis=1).astype(jnp.float32)
                boxes_p = tc.bbox_to_process(boxes_raw)
                tiles = self._tile_batch(variables, image_hr, gorigins,
                                         boxes_p, coarse_ctx)
                # reference resizes tile depth to raw tile size with
                # F.interpolate default mode == nearest (bp:203)
                tiles = interpolate(tiles[..., None], tc.patch_raw_shape,
                                    mode="nearest")[..., 0]
                num = paste_dynamic(tiles * blur_raw, gorigins,
                                    tc.image_raw_shape)
                den = paste_dynamic(jnp.broadcast_to(
                    blur_raw, tiles.shape), gorigins, tc.image_raw_shape)
                return num, den

            nums, dens = jax.lax.map(one_group, groups)
            avg = avg.update(nums.sum(0), dens.sum(0))

        return avg.average

    def _build(self, mode: str, n_random: int):
        """Trace one full-mode program. mode in {m1, m2, r}; rN adds
        n_random random tiles in groups of process_num."""
        plan = self._mode_plan(mode)

        def fn(variables, image_lr, image_hr, rand_origins):
            coarse_ctx = self._coarse_ctx(variables, image_lr)
            return self._image_stream(variables, image_hr, rand_origins,
                                      coarse_ctx, mode, n_random, plan)

        return jax.jit(fn)

    def _build_batch(self, mode: str, n_random: int):
        """Multi-image program (throughput serving): ONE coarse pass over
        the stacked (B,h,w,3) batch — the batch-1 coarse pass runs at ~7%
        MFU, so batching it across images recovers most of its cost — then
        a lax.map over the per-image tile streams (compiled once, not B
        times). Numerically identical to B calls of the per-image program:
        every stage is batch-pointwise."""
        plan = self._mode_plan(mode)

        def fn(variables, images_lr, images_hr, rand_origins):
            if self.fusion:
                coarse_depth, coarse_feats = self.net.apply(
                    variables, images_lr,
                    method=PatchFusionNet.coarse_forward)
                g2l_feats = self.net.apply(
                    variables, coarse_feats,
                    method=PatchFusionNet.attend_coarse)
                ctx = (coarse_depth, coarse_feats, g2l_feats)
            else:
                ctx = None

            def per_image(args):
                image_hr, rand, ctx_i = args
                # restore the leading batch-1 dim the stream code expects
                ctx_full = (None if ctx_i is None else
                            jax.tree.map(lambda x: x[None], ctx_i))
                return self._image_stream(variables, image_hr, rand,
                                          ctx_full, mode, n_random, plan)

            return jax.lax.map(per_image, (images_hr, rand_origins, ctx))

        return jax.jit(fn)

    # -- public API ----------------------------------------------------------

    def shard_report(self, cai_mode: str = "m1") -> Dict[str, Any]:
        """Per-pass shard accounting for a mode under the current mesh —
        the scaling-efficiency ledger the CLIs log (VERDICT r2: account for
        tile padding and the replicated coarse pass).

        Wall-clock is set by the per-device padded tile count; the padding
        duplicates and the replicated coarse pass burn FLOPs/energy but not
        latency (every device runs them concurrently with useful work)."""
        tc = self.tile_cfg
        ndev = (int(self.mesh.shape[self.patch_axis])
                if self.mesh is not None else 1)
        offsets = [(0, 0)]
        if cai_mode == "m2" or cai_mode.startswith("r"):
            prh, prw = tc.patch_raw_shape
            offsets += [(0, prw // 2), (prh // 2, 0), (prh // 2, prw // 2)]
        counts = []
        for off in offsets:
            oh, ow = tc.regular_origins(off)
            counts.append(len(oh) * len(ow))
        total = sum(counts)
        padded = total + (-total) % ndev

        n_rand = rand_padded = 0
        if cai_mode.startswith("r"):
            group = self.tile_group or 1
            if self.rn_times_process_num:
                n_rand = int(cai_mode[1:]) * group
            else:
                n_rand = (int(cai_mode[1:]) // group) * group
            per_group = group + (-group) % ndev
            rand_padded = (n_rand // group) * per_group if group else 0

        work = padded + rand_padded
        useful = total + n_rand
        return {
            "devices": ndev,
            "pass_tiles": counts,
            "regular_tiles": total,
            "regular_padded": padded,
            "random_tiles": n_rand,
            "random_padded": rand_padded,
            "tiles_per_device": work // max(ndev, 1),
            "padding_waste_frac": round(1.0 - useful / work, 4) if work
            else 0.0,
            "coarse_pass_replicas": ndev,
        }

    def random_origins(self, n: int, rng: np.random.Generator) -> np.ndarray:
        """Host-side random tile origins replicating the reference's
        distribution (baseline_pretrain.py:155-156: per group of process_num
        tiles, independent h per tile but ONE shared w)."""
        tc = self.tile_cfg
        pn = self.tile_group or 1
        n_groups = n // pn
        hs, ws = [], []
        for _ in range(n_groups):
            w = rng.integers(0, tc.image_raw_shape[1]
                             - tc.patch_raw_shape[1] - 1, endpoint=True)
            for _ in range(pn):
                h = rng.integers(0, tc.image_raw_shape[0]
                                 - tc.patch_raw_shape[0] - 1, endpoint=True)
                hs.append(h)
                ws.append(w)
        return np.stack([np.array(hs), np.array(ws)], -1).astype(np.int32)

    def infer(self, image_lr: Array, image_hr: Array, cai_mode: str = "m1",
              rng: Optional[np.random.Generator] = None,
              rand_origins: Optional[np.ndarray] = None) -> Array:
        """image_lr: (1,h,w,3) process-res whole image; image_hr: (H,W,3)
        raw-res image. Returns depth (H',W') — reensemble res for m1/m2,
        raw res for rN (matching the reference tester's output which is then
        bilinearly resized for eval)."""
        if cai_mode.startswith("r"):
            mode, n_random = "r", int(cai_mode[1:])
            if self.rn_times_process_num:
                # BaselinePretrain quirk: rN runs N random_tile calls of
                # process_num tiles each (reference bp:407-410), while
                # PatchFusion runs N//process_num calls (pf:445)
                n_random = n_random * (self.tile_group or 1)
            else:
                n_random = (n_random // (self.tile_group or 1)) * \
                    (self.tile_group or 1)
            if rand_origins is not None:
                rand = np.asarray(rand_origins, np.int32)
                n_random = rand.shape[0]
            else:
                rng = rng or np.random.default_rng(0)
                rand = self.random_origins(n_random, rng)
        elif cai_mode in ("m1", "m2"):
            mode, n_random = cai_mode, 0
            rand = np.zeros((0, 2), np.int32)
        else:  # reference quirk: unknown modes (e.g. "p16") behave as m1
            mode, n_random = "m1", 0
            rand = np.zeros((0, 2), np.int32)

        key = (mode, n_random)
        if key not in self._compiled:
            self._compiled[key] = self._build(mode, n_random)
        # explicit device_put: letting jit upload a host-resident 4K image
        # as a call argument is several times slower than the direct
        # transfer path (measured ~1.5s vs ~65ms through the TPU tunnel)
        if isinstance(image_hr, np.ndarray):
            image_hr = jax.device_put(jnp.asarray(image_hr))
        if isinstance(image_lr, np.ndarray):
            image_lr = jax.device_put(jnp.asarray(image_lr))
        if n_random == 0:
            # m1/m2 pass an empty origins array: upload it ONCE — a fresh
            # host->device transfer per call is a synchronous round trip
            # through the remote-TPU tunnel on an otherwise async dispatch
            if getattr(self, "_empty_rand", None) is None:
                self._empty_rand = jax.device_put(
                    jnp.zeros((0, 2), jnp.int32))
            rand_dev = self._empty_rand
        else:
            rand_dev = jnp.asarray(rand)
        return self._compiled[key](self.variables, image_lr, image_hr,
                                   rand_dev)

    def infer_batch(self, images_lr: Array, images_hr: Array,
                    cai_mode: str = "m1",
                    rng: Optional[np.random.Generator] = None,
                    rand_origins: Optional[np.ndarray] = None) -> Array:
        """Batched-image inference: images_lr (B,h,w,3), images_hr
        (B,H,W,3) -> depth (B,H',W'). Same per-image semantics as
        `infer`, but the coarse pass runs once over the whole batch (see
        _build_batch) — the throughput-serving entry point.
        rand_origins (rN mode): (B, N, 2) per-image origins."""
        b = images_hr.shape[0]
        if cai_mode.startswith("r"):
            mode, n_random = "r", int(cai_mode[1:])
            if self.rn_times_process_num:
                n_random = n_random * (self.tile_group or 1)
            else:
                n_random = (n_random // (self.tile_group or 1)) * \
                    (self.tile_group or 1)
            if rand_origins is not None:
                rand = np.asarray(rand_origins, np.int32)
                n_random = rand.shape[1]
            else:
                rng = rng or np.random.default_rng(0)
                rand = np.stack([self.random_origins(n_random, rng)
                                 for _ in range(b)])
        elif cai_mode in ("m1", "m2"):
            mode, n_random = cai_mode, 0
            rand = np.zeros((b, 0, 2), np.int32)
        else:
            mode, n_random = "m1", 0
            rand = np.zeros((b, 0, 2), np.int32)

        key = ("batch", mode, n_random, b)
        if key not in self._compiled:
            self._compiled[key] = self._build_batch(mode, n_random)
        if isinstance(images_hr, np.ndarray):
            images_hr = jax.device_put(jnp.asarray(images_hr))
        if isinstance(images_lr, np.ndarray):
            images_lr = jax.device_put(jnp.asarray(images_lr))
        return self._compiled[key](self.variables, images_lr, images_hr,
                                   jnp.asarray(rand))
