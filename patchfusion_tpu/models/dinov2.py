"""DINOv2 vision transformer, TPU-native flax implementation.

Functional re-design of the reference backbone (reference
external/torchhub/facebookresearch_dinov2_main/vision_transformer.py:44-328
and dinov2/layers/*): patch embed (14x14), cls token, bicubic pos-embed
interpolation for arbitrary input sizes (vt:179-210), pre-norm blocks with
LayerScale (init 1.0 for the hub models), and `get_intermediate_layers`
returning the last-n block outputs + cls tokens (vt:297-321).

TPU-first choices:
  * tokens are (B, N, D); attention uses `jax.nn.dot_product_attention`
    (flash attention on TPU — the replacement for the reference's optional
    xformers CUDA kernel, dinov2/layers/attention.py:66-81);
  * pos-embed interpolation is a static-shape bicubic expressed as two
    matmuls (ops/resize.py) that XLA constant-folds per input size;
  * the intermediate-layer taps are explicit return values, not hooks.

Hub model hyperparameters (hubconf.py:70-89): img_size=518, patch 14,
init_values=1.0, interpolate_offset=0.1, no registers:
  vits: D=384  depth=12 heads=6
  vitb: D=768  depth=12 heads=12
  vitl: D=1024 depth=24 heads=16
"""

from __future__ import annotations

import os

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from patchfusion_tpu.ops.resize import interpolate
from patchfusion_tpu.ops.activations import gelu as act_gelu

Array = jax.Array

VIT_CONFIGS = {
    "vits": dict(embed_dim=384, depth=12, num_heads=6),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16),
    # structurally-complete micro variant (tests / sharding dry runs): the
    # minimum depth is 4 (the DPT head taps the last four blocks)
    "vitmicro": dict(embed_dim=64, depth=4, num_heads=2),
}


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = act_gelu(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


def fused_attention(q: Array, k: Array, v: Array,
                    impl: Optional[str] = None) -> Array:
    """(B, N, H, Dh) self-attention, dtype-aware.

    bf16 path (TPU inference): custom einsum attention with bf16 probability
    matrices — the XLA builtin upcasts the N x N logits AND probs to f32,
    doubling the HBM traffic of the memory-bound softmax stage; keeping
    probs in bf16 (f32 logits/normalizer for stability) is measurably
    faster at ViT shapes. At these sizes the op is VPU-softmax-bound, not
    HBM-bound: a custom VMEM-resident Pallas kernel
    (ops/pallas_attention.py) ties it exactly, and the stock flash/splash
    kernels lose (BASELINE.md round-3). Set impl="pallas" (or
    PF_ATTN_IMPL=pallas) to use the kernel — e.g. for retuning on a new
    TPU generation.
    f32 path: XLA dot_product_attention (exact parity with the reference's
    dense attention, dinov2/layers/attention.py:48-61).
    """
    if q.dtype != jnp.bfloat16:
        return jax.nn.dot_product_attention(q, k, v)
    impl = impl or os.environ.get("PF_ATTN_IMPL", "einsum")
    if impl == "pallas":
        from patchfusion_tpu.ops.pallas_attention import vit_attention
        return vit_attention(q, k, v)
    dh = q.shape[-1]
    scale = dh ** -0.5
    # bf16 logits: softmax values are bounded and max-subtracted, so bf16's
    # 8-bit mantissa costs ~1e-2 on probabilities — the compute-dtype
    # contract — while halving the dominant N^2 HBM traffic.
    logits = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                        preferred_element_type=jnp.bfloat16)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp((logits - m).astype(jnp.float32)).astype(jnp.bfloat16)
    s = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v,
                   preferred_element_type=jnp.float32)
    o = o / jnp.swapaxes(s, 1, 2)
    return o.astype(q.dtype)


class Attention(nn.Module):
    """Multi-head self-attention over (B, N, D) tokens (fused kernel on
    TPU, see fused_attention)."""
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, d = x.shape
        hd = d // self.num_heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        o = fused_attention(q, k, v)
        o = o.reshape(b, n, d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(o)


class Block(nn.Module):
    """Pre-norm transformer block with LayerScale (dinov2 block.py:36-107)."""
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: Optional[float] = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = Attention(self.num_heads, dtype=self.dtype, name="attn")(h)
        if self.init_values is not None:
            g1 = self.param("ls1_gamma", nn.initializers.constant(
                self.init_values), (d,))
            h = h * g1.astype(h.dtype)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = Mlp(int(d * self.mlp_ratio), d, dtype=self.dtype, name="mlp")(h)
        if self.init_values is not None:
            g2 = self.param("ls2_gamma", nn.initializers.constant(
                self.init_values), (d,))
            h = h * g2.astype(h.dtype)
        return x + h


class DinoViT(nn.Module):
    """DINOv2 ViT. __call__ returns the last-`n_taps` block outputs, each as
    (patch_tokens (B, N, D), cls (B, D)) after the final LayerNorm — the
    explicit-return equivalent of reference get_intermediate_layers
    (vision_transformer.py:297-321) with norm=True, return_class_token=True.
    """
    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int = 14
    img_size: int = 518  # pretraining grid; pos_embed is (img/patch)^2 + 1
    init_values: Optional[float] = 1.0
    interpolate_offset: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, n_taps: int = 4
                 ) -> List[Tuple[Array, Array]]:
        """x: (B, H, W, 3), H and W multiples of patch_size."""
        b, h, w, _ = x.shape
        p = self.patch_size
        d = self.embed_dim
        grid = self.img_size // p
        num_patches = grid * grid

        patches = nn.Conv(d, (p, p), strides=(p, p), padding="VALID",
                          dtype=self.dtype, name="patch_embed")(x)
        gh, gw = h // p, w // p
        tokens = patches.reshape(b, gh * gw, d)

        cls_token = self.param("cls_token",
                               nn.initializers.normal(1e-6), (1, 1, d))
        pos_embed = self.param("pos_embed",
                               nn.initializers.normal(0.02),
                               (1, num_patches + 1, d))

        pe = self._interp_pos_embed(pos_embed, gh, gw, grid)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, d)).astype(tokens.dtype),
             tokens], axis=1)
        tokens = tokens + pe.astype(tokens.dtype)

        take = set(range(self.depth - n_taps, self.depth))
        outs: List[Array] = []
        for i in range(self.depth):
            tokens = Block(self.num_heads, init_values=self.init_values,
                           dtype=self.dtype, name=f"blocks_{i}")(tokens)
            if i in take:
                outs.append(tokens)

        norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")
        result = []
        for o in outs:
            on = norm(o)
            result.append((on[:, 1:], on[:, 0]))
        return result

    def _interp_pos_embed(self, pos_embed: Array, gh: int, gw: int,
                          grid: int) -> Array:
        """Bicubic pos-embed resampling, reference vt:179-210 semantics.

        The reference interpolates with *scale factors* (gh+offset)/grid on
        each axis (torch scale_factor path, align_corners=False); exact
        reproduction matters for checkpoint fidelity.
        """
        if gh == grid and gw == grid:
            return pos_embed
        cls_pe = pos_embed[:, :1]
        patch_pe = pos_embed[:, 1:].reshape(1, grid, grid, -1)
        sy = float(gh + self.interpolate_offset) / grid
        sx = float(gw + self.interpolate_offset) / grid
        patch_pe = interpolate(patch_pe.astype(jnp.float32), (gh, gw),
                               mode="bicubic", align_corners=False,
                               scale=(sy, sx))
        patch_pe = patch_pe.reshape(1, gh * gw, -1).astype(pos_embed.dtype)
        return jnp.concatenate([cls_pe, patch_pe], axis=1)


def build_dinovit(core_type: str, dtype=jnp.float32) -> DinoViT:
    return DinoViT(**VIT_CONFIGS[core_type], dtype=dtype)
