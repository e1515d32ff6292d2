"""BEiT-L/16 backbone + MiDaS v3.1 DPT head (DPT_BEiT_L_384), flax NHWC.

This is the base model of the `patchfusion_zoedepth` family. The reference
pulls it from torch.hub at runtime (external/zoedepth/models/base_models/
midas.py:340, repo "AyaanShah2204/MiDaS") — the code is NOT vendored there;
this module is a from-scratch TPU-native implementation of the published
MiDaS v3.1 DPT_BEiT_L_384 architecture:

  * BEiT-large/16 ViT: patch-embed conv 16x16, cls token, NO absolute
    position embedding; 24 pre-norm blocks with LayerScale (gamma init 1e-5)
    and *decomposed relative position bias* per block — a learned table of
    shape ((2*gh-1)*(2*gw-1)+3, heads) indexed by pairwise token offsets
    (the +3 rows are cls->patch, patch->cls, cls->cls);
  * qkv projection with a learned q_bias and v_bias but a fixed zero k bias
    (the BEiT quirk);
  * feature taps at blocks 5/11/17/23 (raw block outputs, pre-final-norm —
    the hook points of MiDaS `forward_beit`);
  * readout='project': each tap concatenates the cls token to every patch
    token and projects 2D->D with Linear+GELU;
  * reassemble: 1x1 conv to (256, 512, 1024, 1024) channels and resample to
    a 1/4, 1/8, 1/16, 1/32 pyramid (ConvTranspose 4x/2x, identity, stride-2
    conv); scratch 3x3 convs to 256; refinenet4..1 FeatureFusionBlocks;
    output head conv->2x upsample->conv->relu->1x1->relu.

The six activations MidasCore harvests via forward hooks (midas.py:294-315:
out_conv, l4_rn, r4, r3, r2, r1) are explicit entries of the returned dict,
with `out_conv` = the ReLU'd 32-channel feature (the reference hooks
`scratch.output_conv.children()[3]`, midas.py:297-299).

TPU-first choices: the relative-position-bias table is sized for the STATIC
input grid (gh, gw) fixed at trace time — there is no dynamic table
interpolation in the compiled program; a converter importing 24x24-trained
torch weights must bicubic-resample the table once on the host. All channel
mixing is NHWC convs/matmuls on the MXU.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from patchfusion_tpu.models.dpt import FeatureFusionBlock
from patchfusion_tpu.ops.resize import interpolate
from patchfusion_tpu.ops.activations import gelu as act_gelu

Array = jax.Array

BEIT_CONFIGS = {
    # timm beit_large_patch16_384 hyperparameters
    "DPT_BEiT_L_384": dict(embed_dim=1024, depth=24, num_heads=16,
                           hooks=(5, 11, 17, 23)),
    # structurally-complete toy variant (tests / dry runs)
    "BEiT_tiny": dict(embed_dim=64, depth=4, num_heads=4, hooks=(0, 1, 2, 3)),
}
MIDAS_FEATURES = 256
MIDAS_OUT_CHANNELS = (256, 512, 1024, 1024)


@functools.lru_cache(maxsize=8)
def relative_position_index(gh: int, gw: int) -> np.ndarray:
    """(1+N, 1+N) int32 index into the ((2gh-1)(2gw-1)+3,)-row bias table.

    Standard BEiT construction: entry [i+1, j+1] encodes the 2-D offset
    between patch i and patch j; row/col 0 (the cls token) uses the three
    dedicated table rows.
    """
    num_rel = (2 * gh - 1) * (2 * gw - 1)
    coords = np.stack(np.meshgrid(np.arange(gh), np.arange(gw),
                                  indexing="ij"))          # (2, gh, gw)
    flat = coords.reshape(2, -1)                            # (2, N)
    rel = flat[:, :, None] - flat[:, None, :]               # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += gh - 1
    rel[:, :, 1] += gw - 1
    rel[:, :, 0] *= 2 * gw - 1
    n = gh * gw
    idx = np.zeros((n + 1, n + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel      # cls -> patch
    idx[0:, 0] = num_rel + 1  # patch -> cls
    idx[0, 0] = num_rel + 2   # cls -> cls
    return idx.astype(np.int32)


class BeitAttention(nn.Module):
    """BEiT MHSA: q/v-only qkv bias + per-block relative position bias."""
    num_heads: int
    grid: Tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, d = x.shape
        hd = d // self.num_heads
        gh, gw = self.grid
        assert n == gh * gw + 1, (n, self.grid)

        w_qkv = self.param("qkv_kernel", nn.initializers.xavier_uniform(),
                           (d, 3 * d))
        q_bias = self.param("q_bias", nn.initializers.zeros, (d,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (d,))
        bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
        qkv = x @ w_qkv.astype(x.dtype) + bias.astype(x.dtype)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        num_rel = (2 * gh - 1) * (2 * gw - 1) + 3
        table = self.param("relative_position_bias_table",
                           nn.initializers.zeros, (num_rel, self.num_heads))
        idx = jnp.asarray(relative_position_index(gh, gw))
        rel_bias = jnp.transpose(table[idx], (2, 0, 1))  # (H, 1+N, 1+N)

        scale = hd ** -0.5
        logits = jnp.einsum("bnhd,bmhd->bhnm", (q * scale), k,
                            preferred_element_type=jnp.float32)
        logits = logits + rel_bias[None].astype(logits.dtype)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", probs, v,
                       preferred_element_type=jnp.float32)
        o = o.astype(x.dtype).reshape(b, n, d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(o)


class BeitBlock(nn.Module):
    """Pre-norm block with LayerScale (timm beit Block, init_values=1e-5)."""
    num_heads: int
    grid: Tuple[int, int]
    mlp_ratio: float = 4.0
    init_values: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = BeitAttention(self.num_heads, self.grid, dtype=self.dtype,
                          name="attn")(h)
        g1 = self.param("gamma_1", nn.initializers.constant(
            self.init_values), (d,))
        x = x + h * g1.astype(h.dtype)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(h)
        h = act_gelu(h)
        h = nn.Dense(d, dtype=self.dtype, name="mlp_fc2")(h)
        g2 = self.param("gamma_2", nn.initializers.constant(
            self.init_values), (d,))
        return x + h * g2.astype(h.dtype)


class BeitBackbone(nn.Module):
    """BEiT ViT returning raw block outputs at the MiDaS hook indices."""
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 16
    hooks: Sequence[int] = (5, 11, 17, 23)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        b, h, w, _ = x.shape
        p, d = self.patch_size, self.embed_dim
        gh, gw = h // p, w // p
        patches = nn.Conv(d, (p, p), strides=(p, p), padding="VALID",
                          dtype=self.dtype, name="patch_embed")(x)
        tokens = patches.reshape(b, gh * gw, d)
        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, d))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, d)).astype(tokens.dtype),
             tokens], axis=1)

        take = set(self.hooks)
        taps: List[Array] = []
        for i in range(self.depth):
            tokens = BeitBlock(self.num_heads, (gh, gw), dtype=self.dtype,
                               name=f"blocks_{i}")(tokens)
            if i in take:
                taps.append(tokens)
        return taps


class MidasDPTHead(nn.Module):
    """MiDaS v3.1 DPT decoder over four ViT taps.

    Returns (rel_depth (B, H, W, 1), features dict with the six MidasCore
    hook taps out_conv/l4_rn/r4/r3/r2/r1).
    """
    features: int = MIDAS_FEATURES
    out_channels: Sequence[int] = MIDAS_OUT_CHANNELS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, taps: List[Array], gh: int, gw: int
                 ) -> Tuple[Array, Dict[str, Array]]:
        feats: Dict[str, Array] = {}
        pyramid = []
        for i, tok in enumerate(taps):
            b, n, d = tok.shape
            # readout='project': cat cls to each patch token, Linear+GELU
            cls = jnp.broadcast_to(tok[:, :1], (b, n - 1, d))
            x = jnp.concatenate([tok[:, 1:], cls], axis=-1)
            x = nn.Dense(d, dtype=self.dtype, name=f"readout_{i}")(x)
            x = act_gelu(x)
            x = x.reshape(b, gh, gw, d)
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
                      dtype=self.dtype, name="output_conv_0")(p1)
        out = interpolate(out, (out.shape[1] * 2, out.shape[2] * 2),
                          mode="bilinear", align_corners=True)
        out = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                      name="output_conv_2")(out)
        out = nn.relu(out)
        feats["out_conv"] = out  # midas.py:297-299 hooked ReLU activation
        out = nn.Conv(1, (1, 1), dtype=self.dtype, name="output_conv_4")(out)
        out = nn.relu(out)
        return out, feats


class MidasDPTBEiT(nn.Module):
    """DPT_BEiT_L_384: BEiT backbone + MiDaS DPT head.

    __call__(x NHWC, H and W multiples of 32) -> (rel_depth (B, H, W),
    features dict) — the counterpart of DPTDinov2 for the zoedepth family.
    """
    model_type: str = "DPT_BEiT_L_384"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Dict[str, Array]]:
        b, h, w, _ = x.shape
        if self.model_type not in BEIT_CONFIGS:
            raise ValueError(
                f"unknown midas_model_type {self.model_type!r}; "
                f"available: {sorted(BEIT_CONFIGS)}")
        cfg = BEIT_CONFIGS[self.model_type]
        backbone = BeitBackbone(
            embed_dim=cfg["embed_dim"], depth=cfg["depth"],
            num_heads=cfg["num_heads"], hooks=cfg["hooks"],
            dtype=self.dtype, name="pretrained")
        taps = backbone(x)
        gh, gw = h // 16, w // 16
        depth, feats = MidasDPTHead(dtype=self.dtype, name="scratch")(
            taps, gh, gw)
        if depth.shape[1:3] != (h, w):
            depth = interpolate(depth, (h, w), mode="bilinear",
                                align_corners=True)
        return depth[..., 0], feats
