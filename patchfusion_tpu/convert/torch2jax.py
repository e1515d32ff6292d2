"""PyTorch state_dict → flax param-tree conversion.

Maps the reference checkpoints (coarse ckpt + fine ckpt + fusion-only ckpt,
see reference estimator/models/patchfusion.py:176-187 get_save_dict/load_dict
and tools/convert_huggingface.py) onto patchfusion_tpu's NHWC flax modules.

Layout rules:
  Linear  : torch (out, in)            -> flax kernel (in, out)
  Conv2d  : torch (out, in, kh, kw)    -> flax NHWC kernel (kh, kw, in, out)
  ConvT2d : torch (in, out, kh, kw)    -> flax NHWC kernel (kh, kw, in, out)
            (flax ConvTranspose with transpose_kernel=False convolves with
             the kernel directly; torch's ConvT scatters — equivalent to a
             flax kernel that is the torch kernel flipped spatially... we use
             transpose_kernel=True modules so the mapping below is exact.)
  LayerNorm / BatchNorm: weight->scale, bias->bias; BN running stats go to
            batch_stats collection.

All converters work on numpy arrays so they run without a GPU/TPU.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def conv(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def conv_transpose(sd: Mapping[str, Any], prefix: str
                   ) -> Dict[str, np.ndarray]:
    # torch ConvT weight: (in, out, kh, kw) -> flax (kh, kw, in, out) with
    # transpose_kernel=True on the flax module.
    out = {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 0, 1)}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def layernorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[prefix + ".weight"]),
            "bias": _np(sd[prefix + ".bias"])}


def batchnorm_params(sd: Mapping[str, Any], prefix: str
                     ) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[prefix + ".weight"]),
            "bias": _np(sd[prefix + ".bias"])}


def batchnorm_stats(sd: Mapping[str, Any], prefix: str
                    ) -> Dict[str, np.ndarray]:
    return {"mean": _np(sd[prefix + ".running_mean"]),
            "var": _np(sd[prefix + ".running_var"])}


# ---------------------------------------------------------------------------
# DINOv2 ViT
# ---------------------------------------------------------------------------

def dinovit_params(sd: Mapping[str, Any], depth: int,
                   prefix: str = "") -> Dict[str, Any]:
    """Convert a DINOv2 DinoVisionTransformer state_dict (hub layout,
    block_chunks=0) to DinoViT flax params."""
    p = prefix
    params: Dict[str, Any] = {
        "cls_token": _np(sd[p + "cls_token"]),
        "pos_embed": _np(sd[p + "pos_embed"]),
        "patch_embed": conv(sd, p + "patch_embed.proj"),
        "norm": layernorm(sd, p + "norm"),
    }
    for i in range(depth):
        bp = f"{p}blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": layernorm(sd, bp + ".norm1"),
            "attn": {"qkv": linear(sd, bp + ".attn.qkv"),
                     "proj": linear(sd, bp + ".attn.proj")},
            "ls1_gamma": _np(sd[bp + ".ls1.gamma"]),
            "norm2": layernorm(sd, bp + ".norm2"),
            "mlp": {"fc1": linear(sd, bp + ".mlp.fc1"),
                    "fc2": linear(sd, bp + ".mlp.fc2")},
            "ls2_gamma": _np(sd[bp + ".ls2.gamma"]),
        }
    return params
