"""Depth-Anything DPT decoder on DINOv2, TPU-native flax implementation.

Re-design of reference external/depth_anything/dpt.py + blocks.py: four
intermediate ViT layers are projected, resized to a feature pyramid, refined
through FeatureFusionBlocks, and decoded to relative depth. The six
multi-scale features the reference harvests with forward hooks
(external/zoedepth/models/base_models/depth_anything.py:299-321: out_conv,
l4_rn, r4, r3, r2, r1) are explicit entries of the returned dict here.

All convs NHWC; upsampling uses the PyTorch-parity `interpolate`
(align_corners=True throughout, reference dpt.py:15,127,154).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from patchfusion_tpu.models.dinov2 import DinoViT, VIT_CONFIGS
from patchfusion_tpu.ops.resize import interpolate

Array = jax.Array

DPT_CONFIGS = {
    "vits": dict(features=64, out_channels=(48, 96, 192, 384)),
    "vitb": dict(features=128, out_channels=(96, 192, 384, 768)),
    "vitl": dict(features=256, out_channels=(256, 512, 1024, 1024)),
    "vitmicro": dict(features=32, out_channels=(16, 32, 64, 128)),
}


class ResidualConvUnit(nn.Module):
    """relu→conv3x3→relu→conv3x3 + skip (reference blocks.py:37-92, bn=False
    in all Depth-Anything configs)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        return h + x


class FeatureFusionBlock(nn.Module):
    """Refinenet block (reference blocks.py:95-152): optional skip through a
    ResidualConvUnit, refine, bilinear-upsample (align_corners=True), 1x1
    out conv."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, skip: Array = None,
                 size: Tuple[int, int] = None) -> Array:
        # the reference instantiates resConfUnit1 even in refinenet4 where
        # the forward never uses it (blocks.py:95-152 / dpt.py:108); feed it
        # zeros there so the param tree matches the reference checkpoint
        # layout exactly (XLA dead-code-eliminates the unused compute)
        rcu1_in = skip if skip is not None else jnp.zeros_like(x)
        rcu1_out = ResidualConvUnit(self.features, dtype=self.dtype,
                                    name="rcu1")(rcu1_in)
        if skip is not None:
            x = x + rcu1_out
        x = ResidualConvUnit(self.features, dtype=self.dtype, name="rcu2")(x)
        if size is None:
            size = (x.shape[-3] * 2, x.shape[-2] * 2)
        x = interpolate(x, size, mode="bilinear", align_corners=True)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="out_conv")(x)


class DPTHead(nn.Module):
    """reference dpt.py:20-130 (use_clstoken=False for all DA checkpoints).

    Returns (rel_depth_logits (B,H,W,1) pre-final-resize, features dict).
    """
    features: int
    out_channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, taps: List[Tuple[Array, Array]], ph: int, pw: int
                 ) -> Tuple[Array, Dict[str, Array]]:
        feats: Dict[str, Array] = {}
        pyramid = []
        for i, (tok, _cls) in enumerate(taps):
            b, n, d = tok.shape
            x = tok.reshape(b, ph, pw, d)
            x = nn.Conv(self.out_channels[i], (1, 1), dtype=self.dtype,
                        name=f"project_{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(self.out_channels[0], (4, 4),
                                     strides=(4, 4), padding="VALID",
                                     transpose_kernel=True, dtype=self.dtype,
                                     name="resize_0")(x)
            elif i == 1:
                x = nn.ConvTranspose(self.out_channels[1], (2, 2),
                                     strides=(2, 2), padding="VALID",
                                     transpose_kernel=True, dtype=self.dtype,
                                     name="resize_1")(x)
            elif i == 3:
                x = nn.Conv(self.out_channels[3], (3, 3), strides=(2, 2),
                            padding=1, dtype=self.dtype, name="resize_3")(x)
            pyramid.append(x)

        rn = [nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name=f"layer{i + 1}_rn")(pyramid[i])
              for i in range(4)]
        feats["l4_rn"] = rn[3]

        p4 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                name="refinenet4")(
            rn[3], size=rn[2].shape[1:3])
        feats["r4"] = p4
        p3 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                name="refinenet3")(
            p4, rn[2], size=rn[1].shape[1:3])
        feats["r3"] = p3
        p2 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                name="refinenet2")(
            p3, rn[1], size=rn[0].shape[1:3])
        feats["r2"] = p2
        p1 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                name="refinenet1")(p2, rn[0])
        feats["r1"] = p1

        out = nn.Conv(self.features // 2, (3, 3), padding=1,
                      dtype=self.dtype, name="output_conv1")(p1)
        out = interpolate(out, (ph * 14, pw * 14), mode="bilinear",
                          align_corners=True)
        out = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                      name="output_conv2_0")(out)
        out = nn.relu(out)
        feats["out_conv"] = out  # the reference's hooked 32-ch activation
        out = nn.Conv(1, (1, 1), dtype=self.dtype, name="output_conv2_2")(out)
        out = nn.relu(out)
        return out, feats


class DPTDinov2(nn.Module):
    """reference dpt.py:133-157 DPT_DINOv2: DINOv2 backbone + DPTHead.

    __call__(x NHWC) -> (rel_depth (B, H, W), features dict with the six
    reference hook taps).
    """
    core_type: str = "vits"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Dict[str, Array]]:
        b, h, w, _ = x.shape
        vit = DinoViT(**VIT_CONFIGS[self.core_type], dtype=self.dtype,
                      name="pretrained")
        taps = vit(x, n_taps=4)
        ph, pw = h // 14, w // 14
        head = DPTHead(**DPT_CONFIGS[self.core_type], dtype=self.dtype,
                       name="depth_head")
        depth, feats = head(taps, ph, pw)
        if depth.shape[1:3] != (h, w):
            depth = interpolate(depth, (h, w), mode="bilinear",
                                align_corners=True)
        depth = nn.relu(depth)
        return depth[..., 0], feats
