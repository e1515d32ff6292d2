"""PyTorch state_dict → flax param-tree conversion.

Maps the reference checkpoints (coarse ckpt + fine ckpt + fusion-only ckpt,
see reference estimator/models/patchfusion.py:176-187 get_save_dict/load_dict
and tools/convert_huggingface.py) onto patchfusion_tpu's NHWC flax modules.

Layout rules:
  Linear  : torch (out, in)            -> flax kernel (in, out)
  Conv2d  : torch (out, in, kh, kw)    -> flax NHWC kernel (kh, kw, in, out)
  ConvT2d : torch (in, out, kh, kw)    -> flax kernel (kh, kw, out, in)
            with transpose_kernel=True on the flax module (bit-exact).
  LayerNorm / BatchNorm: weight->scale, bias->bias; BN running stats go to
            batch_stats collection.

All converters work on numpy arrays so they run without a GPU/TPU.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

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
    # torch ConvT weight: (in, out, kh, kw) -> flax (kh, kw, out, in) with
    # transpose_kernel=True on the flax module (verified exact vs torch).
    out = {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
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
# DPT (Depth-Anything decoder)
# ---------------------------------------------------------------------------

def _ffb(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    def rcu(p):
        return {"conv1": conv(sd, p + ".conv1"),
                "conv2": conv(sd, p + ".conv2")}
    return {"rcu1": rcu(prefix + ".resConfUnit1"),
            "rcu2": rcu(prefix + ".resConfUnit2"),
            "out_conv": conv(sd, prefix + ".out_conv")}


def dpt_head_params(sd: Mapping[str, Any], prefix: str = "depth_head."
                    ) -> Dict[str, Any]:
    """Reference DPTHead (depth_anything/dpt.py:20-130) -> flax DPTHead."""
    p = prefix
    params: Dict[str, Any] = {}
    for i in range(4):
        params[f"project_{i}"] = conv(sd, f"{p}projects.{i}")
    params["resize_0"] = conv_transpose(sd, p + "resize_layers.0")
    params["resize_1"] = conv_transpose(sd, p + "resize_layers.1")
    params["resize_3"] = conv(sd, p + "resize_layers.3")
    for i in range(4):
        params[f"layer{i + 1}_rn"] = conv(sd, f"{p}scratch.layer{i + 1}_rn")
        params[f"refinenet{i + 1}"] = _ffb(sd, f"{p}scratch.refinenet{i + 1}")
    params["output_conv1"] = conv(sd, p + "scratch.output_conv1")
    params["output_conv2_0"] = conv(sd, p + "scratch.output_conv2.0")
    params["output_conv2_2"] = conv(sd, p + "scratch.output_conv2.2")
    return params


def dpt_dinov2_params(sd: Mapping[str, Any], depth: int,
                      prefix: str = "") -> Dict[str, Any]:
    """Reference DPT_DINOv2 -> flax DPTDinov2 params."""
    return {
        "pretrained": dinovit_params(sd, depth, prefix + "pretrained."),
        "depth_head": dpt_head_params(sd, prefix + "depth_head."),
    }


# ---------------------------------------------------------------------------
# Guided fusion (U-Net + G2L swin)
# ---------------------------------------------------------------------------

def _double_conv_bn(sd, prefix):
    """reference DoubleConv (guided_fusion_model.py:52-69): Sequential
    [conv, bn, relu, conv, bn, relu]."""
    params = {"conv1": conv(sd, prefix + ".0"),
              "bn1": batchnorm_params(sd, prefix + ".1"),
              "conv2": conv(sd, prefix + ".3"),
              "bn2": batchnorm_params(sd, prefix + ".4")}
    stats = {"bn1": batchnorm_stats(sd, prefix + ".1"),
             "bn2": batchnorm_stats(sd, prefix + ".4")}
    return params, stats


def _double_conv_wobn(sd, prefix):
    """reference DoubleConvWOBN (gf:34-50): Sequential [conv, relu, conv,
    relu]."""
    return {"conv1": conv(sd, prefix + ".0"),
            "conv2": conv(sd, prefix + ".2")}


def _swin_block(sd, prefix):
    return {
        "norm1": layernorm(sd, prefix + ".norm1"),
        "attn": {
            "qkv": linear(sd, prefix + ".attn.qkv"),
            "proj": linear(sd, prefix + ".attn.proj"),
            "relative_position_bias_table":
                _np(sd[prefix + ".attn.relative_position_bias_table"]),
        },
        "norm2": layernorm(sd, prefix + ".norm2"),
        "mlp_fc1": linear(sd, prefix + ".mlp.fc1"),
        "mlp_fc2": linear(sd, prefix + ".mlp.fc2"),
    }


def g2l_params(sd: Mapping[str, Any], prefix: str, depth: int
               ) -> Dict[str, Any]:
    """reference G2LFusion (swin_layers.py:360-431) -> flax G2LFusion.
    (embed_proj exists in torch checkpoints but is dead — area_prior is
    always None in PatchFusion — so it is intentionally dropped.)"""
    params = {
        "absolute_pos_embed": _np(sd[prefix + ".absolute_pos_embed"]),
        "norm": layernorm(sd, prefix + ".g2l_layer_norm"),
    }
    for j in range(depth):
        params[f"block_{j}"] = _swin_block(sd,
                                           f"{prefix}.g2l_layer.blocks.{j}")
    return params


def guided_fusion_params(sd: Mapping[str, Any], depths, prefix: str = ""
                         ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """reference GuidedFusionPatchFusion -> (params, batch_stats)."""
    p = prefix
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["inc"], stats["inc"] = _double_conv_bn(sd, p + "inc.double_conv")
    n_levels = len(depths)
    for i in range(n_levels - 1):
        params[f"down_{i}"], stats[f"down_{i}"] = _double_conv_bn(
            sd, f"{p}down_conv_list.{i}.maxpool_conv.1.double_conv")
        params[f"up_{i}"] = _double_conv_wobn(
            sd, f"{p}up_conv_list.{i}.conv.double_conv")
    depths_inv = list(depths)[::-1]
    for i in range(n_levels):
        params[f"g2l_{i}"] = g2l_params(sd, f"{p}g2l_list.{i}",
                                        depths_inv[i])
        params[f"fuse_{i}"] = _double_conv_wobn(
            sd, f"{p}convs.{i}.double_conv")
    return params, stats


# ---------------------------------------------------------------------------
# ZoeDepth metric-bins head
# ---------------------------------------------------------------------------

def _net2(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """The reference `_net` Sequential: indices 0 and 2 are convs."""
    return {"net_0": conv(sd, prefix + "._net.0"),
            "net_2": conv(sd, prefix + "._net.2")}


def metric_bins_head_params(sd: Mapping[str, Any], prefix: str = ""
                            ) -> Dict[str, Any]:
    """seed bins / projectors / attractors / conditional log-binomial
    (reference zoedepth_v1.py:106-123 or patchfusion.py:152-170 layout)."""
    p = prefix
    params: Dict[str, Any] = {
        "seed_bin_regressor": _net2(sd, p + "seed_bin_regressor"),
        "seed_projector": _net2(sd, p + "seed_projector"),
        "conditional_log_binomial": {
            "mlp_0": conv(sd, p + "conditional_log_binomial.mlp.0"),
            "mlp_2": conv(sd, p + "conditional_log_binomial.mlp.2")},
    }
    for i in range(4):
        params[f"projector_{i}"] = _net2(sd, f"{p}projectors.{i}")
        params[f"attractor_{i}"] = _net2(sd, f"{p}attractors.{i}")
    return params


def zoedepth_params(sd: Mapping[str, Any], depth: int, prefix: str = ""
                    ) -> Dict[str, Any]:
    """Reference ZoeDepth (DA core) state_dict -> flax ZoeDepthDA params.

    Torch layout: core.core.{pretrained,depth_head}.*, conv2.*, and the head
    layers at top level."""
    p = prefix
    return {
        "core": dpt_dinov2_params(sd, depth, p + "core.core."),
        "conv2": conv(sd, p + "conv2"),
        "head": metric_bins_head_params(sd, p),
    }


# ---------------------------------------------------------------------------
# Full PatchFusion
# ---------------------------------------------------------------------------

def patchfusion_params(sd: Mapping[str, Any], vit_depth: int,
                       fusion_depths=(2, 2, 3, 3, 4, 4)
                       ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Full reference PatchFusion state_dict (coarse + fine + fusion; see
    patchfusion.py:176-187) -> (params, batch_stats) for PatchFusionNet."""
    params: Dict[str, Any] = {
        "coarse_branch": zoedepth_params(sd, vit_depth, "coarse_branch."),
        "fine_branch": zoedepth_params(sd, vit_depth, "fine_branch."),
        "head": metric_bins_head_params(sd, ""),
    }
    for i in range(6):
        params[f"fusion_conv_{i}"] = conv(sd, f"fusion_conv_list.{i}")
    fparams, fstats = guided_fusion_params(sd, fusion_depths,
                                           "guided_fusion.")
    params["fusion"] = fparams
    return params, {"fusion": fstats}


def fusion_only_params(sd: Mapping[str, Any],
                       fusion_depths=(2, 2, 3, 3, 4, 4)
                       ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """The reference's fusion-only checkpoint (get_save_dict strips the
    frozen branches, patchfusion.py:179-187) -> partial param tree to merge
    over branch params loaded from the coarse/fine checkpoints."""
    params: Dict[str, Any] = {"head": metric_bins_head_params(sd, "")}
    for i in range(6):
        params[f"fusion_conv_{i}"] = conv(sd, f"fusion_conv_list.{i}")
    fparams, fstats = guided_fusion_params(sd, fusion_depths,
                                           "guided_fusion.")
    params["fusion"] = fparams
    return params, {"fusion": fstats}


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
