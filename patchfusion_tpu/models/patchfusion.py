"""PatchFusion top-level model, TPU-native.

Re-design of reference estimator/models/patchfusion.py (PatchFusion) and
estimator/models/baseline_pretrain.py (tile geometry): frozen coarse + fine
ZoeDepth branches, trainable fusion (6 fusion convs + guided-fusion U-Net
with G2L attention + a ZoeDepth-style metric-bins decoder head).

The tiled-inference *engine* (batched crop/resize, scatter stitching, m1/m2/
rN modes) lives in patchfusion_tpu/engine/inference.py; this module is the
pure network: every method is a jit-friendly function of (params, arrays).

Key TPU restructurings (all numerically identical to the reference):
  * G2L attention over whole-image coarse features runs once per image
    (`attend_coarse`), not once per process_num chunk
    (cf. reference guided_fusion_model.py:201-202).
  * `coarse_postprocess` ROI-aligns each level from the single whole-image
    copy instead of materialising features repeated N-tiles times
    (cf. reference patchfusion.py:246-250).
  * tiles are a batch axis end-to-end.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from patchfusion_tpu.models.fusion import GuidedFusion
from patchfusion_tpu.models.zoedepth import (MetricBinsHead, N_MIDAS_OUT,
                                             branch_channels, make_zoe_branch)
from patchfusion_tpu.ops.roi_align import (roi_align_batched,
                                           roi_align_single)

Array = jax.Array

# order of the six multi-scale features, low->high resolution (reference
# patchfusion.py:198-204: x_d0, x_blocks_feat_0..3, midas_final_feat)
FEATURE_KEYS = ("x_d0", "x_blocks_feat_0", "x_blocks_feat_1",
                "x_blocks_feat_2", "x_blocks_feat_3", "midas_final_feat")


@dataclasses.dataclass(frozen=True)
class TileConfig:
    """Static tile geometry (reference baseline_pretrain.py:91-119
    prepare_tile_cfg). All pure host math — shapes are compile-time."""
    image_raw_shape: Tuple[int, int]
    patch_split_num: Tuple[int, int]
    patch_process_shape: Tuple[int, int]

    def __post_init__(self):
        h, w = self.image_raw_shape
        sh, sw = self.patch_split_num
        assert h % (2 * sh) == 0, \
            "image height must be divisible by 2 * patch_split_num[0]"
        assert w % (2 * sw) == 0, \
            "image width must be divisible by 2 * patch_split_num[1]"

    @property
    def patch_raw_shape(self) -> Tuple[int, int]:
        return (self.image_raw_shape[0] // self.patch_split_num[0],
                self.image_raw_shape[1] // self.patch_split_num[1])

    @property
    def patch_reensemble_shape(self) -> Tuple[int, int]:
        return (self.patch_process_shape[0] * self.patch_split_num[0],
                self.patch_process_shape[1] * self.patch_split_num[1])

    def regular_origins(self, offset: Tuple[int, int]
                        ) -> Tuple[List[int], List[int]]:
        """Raw-coordinate tile origins for a (possibly shifted) pass
        (reference baseline_pretrain.py:239-242)."""
        ph, pw = self.patch_raw_shape
        nh = (self.image_raw_shape[0] - offset[0]) // ph
        nw = (self.image_raw_shape[1] - offset[1]) // pw
        return ([ph * i + offset[0] for i in range(nh)],
                [pw * j + offset[1] for j in range(nw)])

    def process_origins(self, offset_process: Tuple[int, int]
                        ) -> Tuple[List[int], List[int]]:
        """Reensemble-space paste origins (baseline_pretrain.py:248-251)."""
        ph, pw = self.patch_process_shape
        nh = (self.patch_reensemble_shape[0] - offset_process[0]) // ph
        nw = (self.patch_reensemble_shape[1] - offset_process[1]) // pw
        return ([ph * i + offset_process[0] for i in range(nh)],
                [pw * j + offset_process[1] for j in range(nw)])

    def bboxes_for(self, origins_h: Sequence[int], origins_w: Sequence[int]
                   ) -> np.ndarray:
        """Raw-coordinate [x1, y1, x2, y2] boxes, row-major over (h, w)."""
        ph, pw = self.patch_raw_shape
        boxes = [[x, y, x + pw, y + ph]
                 for y in origins_h for x in origins_w]
        return np.array(boxes, np.float32)

    def bbox_to_process(self, boxes: Array) -> Array:
        """Raw -> process ("feature") coordinates (reference
        patchfusion.py:373-378 bboxs_feat_factor)."""
        fx = self.patch_process_shape[1] / self.image_raw_shape[1]
        fy = self.patch_process_shape[0] / self.image_raw_shape[0]
        return boxes * jnp.asarray([fx, fy, fx, fy], boxes.dtype)


class PatchFusionNet(nn.Module):
    """The PatchFusion network (reference patchfusion.py:56-174).

    Submodules: coarse_branch / fine_branch (frozen DA-ZoeDepth), six fusion
    convs, the guided-fusion U-Net, and the PF metric-bins decoder head.
    """
    coarse: Dict[str, Any]
    fine: Dict[str, Any]
    guided_fusion: Dict[str, Any]
    min_depth: float = 1e-3
    max_depth: float = 80.0
    patch_process_shape: Tuple[int, int] = (392, 518)
    # rematerialize the trainable fusion stage in the backward pass (see
    # GuidedFusion.remat); inference is unaffected, param tree unchanged
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.coarse_branch = make_zoe_branch(
            self.coarse, self.min_depth, self.max_depth, dtype=self.dtype)
        self.fine_branch = make_zoe_branch(
            self.fine, self.min_depth, self.max_depth, dtype=self.dtype)
        c = branch_channels(self.fine)
        chans = [c] * 5 + [N_MIDAS_OUT]
        self.fusion_convs = [
            nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    name=f"fusion_conv_{i}")
            for i, ch in enumerate(chans)]
        self.fusion = GuidedFusion(**self.guided_fusion, remat=self.remat,
                                   dtype=self.dtype)
        cb = self.coarse_branch
        Head = nn.remat(MetricBinsHead) if self.remat else MetricBinsHead
        self.head = Head(
            n_bins=cb.n_bins, bin_embedding_dim=cb.bin_embedding_dim,
            min_depth=self.min_depth, max_depth=self.max_depth,
            n_attractors=cb.n_attractors, attractor_alpha=cb.attractor_alpha,
            attractor_gamma=cb.attractor_gamma,
            attractor_kind=cb.attractor_kind,
            attractor_type=cb.attractor_type,
            bin_centers_type=cb.bin_centers_type, min_temp=cb.min_temp,
            max_temp=cb.max_temp, dtype=self.dtype, name="head")

    # -- branch passes ------------------------------------------------------

    def coarse_forward(self, image_lr: Array
                       ) -> Tuple[Array, List[Array]]:
        """(B,H,W,3) -> (coarse depth (B,H,W,1), 6 features low->high)
        (reference patchfusion.py:189-206)."""
        out = self.coarse_branch(image_lr)
        feats = [out["temp_features"][k] for k in FEATURE_KEYS]
        return out["metric_depth"], feats

    def fine_forward(self, crops: Array) -> Tuple[Array, List[Array]]:
        """(N,h,w,3) -> (fine depth (N,h,w,1), 6 features)
        (patchfusion.py:208-225)."""
        out = self.fine_branch(crops)
        feats = [out["temp_features"][k] for k in FEATURE_KEYS]
        return out["metric_depth"], feats

    def attend_coarse(self, coarse_feats: List[Array]) -> List[Array]:
        """G2L attention over whole-image coarse features — once per image."""
        return self.fusion.attend_coarse(coarse_feats)

    # -- roi cropping --------------------------------------------------------

    def _roi(self, feat: Array, boxes: Array, batched: bool) -> Array:
        h, w = feat.shape[-3], feat.shape[-2]
        scale = h / self.patch_process_shape[0]
        fn = roi_align_batched if batched else roi_align_single
        return fn(feat, boxes, h, w, scale, sampling_ratio=1)

    def coarse_postprocess(self, coarse_depth: Array,
                           coarse_feats: List[Array],
                           g2l_feats: List[Array], boxes_process: Array,
                           batched: bool = False
                           ) -> Tuple[Array, List[Array], List[Array]]:
        """ROI-align coarse depth + raw/attended features to the tile boxes
        (patchfusion.py:227-257; test mode reads the single whole-image copy
        instead of repeating it per tile)."""
        depth_roi = self._roi(coarse_depth, boxes_process, batched)
        feat_rois = [self._roi(f, boxes_process, batched)
                     for f in coarse_feats]
        g2l_rois = [self._roi(f, boxes_process, batched) for f in g2l_feats]
        return depth_roi, feat_rois, g2l_rois

    # -- fusion --------------------------------------------------------------

    def fusion_forward(self, fine_depth: Array, crops: Array,
                       coarse_feat_rois: List[Array],
                       fine_feats: List[Array], g2l_rois: List[Array],
                       coarse_depth_roi: Array, train: bool = False
                       ) -> Array:
        """Per-tile fusion -> metric depth (N,h,w,1)
        (reference patchfusion.py:259-340)."""
        guide_cat = [
            self.fusion_convs[i](jnp.concatenate([cr, ff], axis=-1))
            for i, (cr, ff) in enumerate(zip(coarse_feat_rois, fine_feats))]
        input_tensor = jnp.concatenate(
            [coarse_depth_roi, fine_depth, crops], axis=-1)
        outputs = self.fusion(input_tensor, guide_cat, g2l_rois, train=train)
        x = outputs[0]
        x_blocks = outputs[1:]
        last = x_blocks[-1]
        # the reference's rel_cond is vestigially zero (patchfusion.py:300)
        rel_cond = jnp.zeros(last.shape[:3] + (1,), last.dtype)
        out = self.head(x, x_blocks[:4], last, rel_cond)
        return out["metric_depth"]

    def infer_tiles(self, crops: Array, coarse_feat_rois: List[Array],
                    g2l_rois: List[Array], coarse_depth_roi: Array) -> Array:
        """fine pass + fusion for a batch of tiles (patchfusion.py:343-356)."""
        fine_depth, fine_feats = self.fine_forward(crops)
        return self.fusion_forward(fine_depth, crops, coarse_feat_rois,
                                   fine_feats, g2l_rois, coarse_depth_roi)

    # -- training ------------------------------------------------------------

    def train_forward(self, image_lr: Array, crops_image_hr: Array,
                      bboxs: Array, tile_cfg: Optional[TileConfig] = None,
                      train: bool = True) -> Array:
        """Training forward (patchfusion.py:372-393): one random crop per
        sample; bboxs are raw-coordinate [x1,y1,x2,y2] aligned with the
        batch. Returns per-crop depth prediction."""
        if tile_cfg is None:
            fx = self.patch_process_shape[1] / 3840
            fy = self.patch_process_shape[0] / 2160
        else:
            fx = self.patch_process_shape[1] / tile_cfg.image_raw_shape[1]
            fy = self.patch_process_shape[0] / tile_cfg.image_raw_shape[0]
        boxes_p = bboxs * jnp.asarray([fx, fy, fx, fy], bboxs.dtype)

        coarse_depth, coarse_feats = self.coarse_forward(image_lr)
        coarse_depth = jax.lax.stop_gradient(coarse_depth)
        coarse_feats = [jax.lax.stop_gradient(f) for f in coarse_feats]
        fine_depth, fine_feats = self.fine_forward(crops_image_hr)
        fine_depth = jax.lax.stop_gradient(fine_depth)
        fine_feats = [jax.lax.stop_gradient(f) for f in fine_feats]

        g2l_feats = self.attend_coarse(coarse_feats)
        depth_roi, feat_rois, g2l_rois = self.coarse_postprocess(
            coarse_depth, coarse_feats, g2l_feats, boxes_p, batched=True)
        return self.fusion_forward(fine_depth, crops_image_hr, feat_rois,
                                   fine_feats, g2l_rois, depth_roi,
                                   train=train)

    def __call__(self, image_lr: Array, crops_image_hr: Array,
                 bboxs: Array) -> Array:
        """Default apply target (used for init)."""
        return self.train_forward(image_lr, crops_image_hr, bboxs,
                                  train=False)
