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

def branch_params(sd: Mapping[str, Any], depth: int, prefix: str = "",
                  family: str = "da", grid=None) -> Dict[str, Any]:
    """Family dispatch for a single ZoeDepth branch state_dict (see
    convert.branch_conversion_spec)."""
    if family == "midas":
        return zoedepth_beit_params(sd, depth, grid, prefix)
    return zoedepth_params(sd, depth, prefix)


def patchfusion_params(sd: Mapping[str, Any], vit_depth: int,
                       fusion_depths=(2, 2, 3, 3, 4, 4),
                       family: str = "da", grid=None
                       ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Full reference PatchFusion state_dict (coarse + fine + fusion; see
    patchfusion.py:176-187) -> (params, batch_stats) for PatchFusionNet."""
    params: Dict[str, Any] = {
        "coarse_branch": branch_params(sd, vit_depth, "coarse_branch.",
                                       family, grid),
        "fine_branch": branch_params(sd, vit_depth, "fine_branch.",
                                     family, grid),
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
# BEiT / MiDaS DPT (the `patchfusion_zoedepth` family)
# ---------------------------------------------------------------------------
# Torch naming is the published MiDaS v3.1 layout the reference loads from
# torch.hub (midas.py:340): pretrained.model.* (timm-style BEiT),
# pretrained.act_postprocessN.* (readout/project/resize) and scratch.*
# (refinenets + output head). tests/torch_ref.py:build_midas_beit is the
# in-repo naming authority + activation oracle.

def resample_beit_rel_pos_table(table: np.ndarray,
                                old_grid: Tuple[int, int],
                                new_grid: Tuple[int, int]) -> np.ndarray:
    """Resample a BEiT relative-position-bias table
    ((2h0-1)*(2w0-1)+3, heads) -> ((2h1-1)*(2w1-1)+3, heads).

    models/beit.py sizes the table for the STATIC trace-time grid, so
    importing weights trained at another grid (e.g. the published 24x24 of
    beit_large_patch16_384 into the 24x32 grid of the 384x512 process shape)
    needs a one-time host-side resample. Rows are stored h-major
    (index = dh*(2w-1)+dw); the offset grid is bilinearly interpolated with
    F.interpolate semantics (align_corners=False) — the convention MiDaS
    v3.1 itself applies at runtime for non-384 inputs — and the 3 special
    cls rows pass through unchanged. Identity when the grids match."""
    if tuple(old_grid) == tuple(new_grid):
        return np.asarray(table)
    import torch
    import torch.nn.functional as F
    oh, ow = 2 * old_grid[0] - 1, 2 * old_grid[1] - 1
    nh, nw = 2 * new_grid[0] - 1, 2 * new_grid[1] - 1
    table = np.asarray(table)
    assert table.shape[0] == oh * ow + 3, (table.shape, old_grid)
    heads = table.shape[1]
    sub = torch.from_numpy(
        np.ascontiguousarray(table[:oh * ow], np.float32))
    sub = sub.reshape(oh, ow, heads).permute(2, 0, 1)[None]
    sub = F.interpolate(sub, size=(nh, nw), mode="bilinear",
                        align_corners=False)
    sub = sub[0].permute(1, 2, 0).reshape(nh * nw, heads).numpy()
    return np.concatenate([sub, table[oh * ow:]], axis=0)


def beit_backbone_params(sd: Mapping[str, Any], depth: int, prefix: str,
                         grid: Tuple[int, int]) -> Dict[str, Any]:
    """timm-style BEiT backbone (pretrained.model.*) -> flax BeitBackbone.

    grid: the flax model's static (gh, gw); rel-pos tables are resampled to
    it when the checkpoint was trained at a different grid."""
    p = prefix
    params: Dict[str, Any] = {
        "cls_token": _np(sd[p + "cls_token"]),
        "patch_embed": conv(sd, p + "patch_embed.proj"),
    }
    for i in range(depth):
        bp = f"{p}blocks.{i}"
        table = _np(sd[bp + ".attn.relative_position_bias_table"])
        nrel = table.shape[0] - 3
        # infer the checkpoint grid from the stored index buffer when
        # present (its shape is (N+1, N+1) with N = gh*gw); else assume
        # square — the published BEiT-L/16-384 case ((2*24-1)^2 rows)
        idx_key = bp + ".attn.relative_position_index"
        if idx_key in sd:
            n_tok = int(np.asarray(sd[idx_key]).shape[0]) - 1
            old_grid = _beit_grid_from(nrel, n_tok)
        else:
            side = int(round(np.sqrt(nrel)))
            assert side * side == nrel, (
                "cannot infer BEiT rel-pos grid: non-square table without "
                "a relative_position_index buffer")
            old_grid = ((side + 1) // 2, (side + 1) // 2)
        params[f"blocks_{i}"] = {
            "norm1": layernorm(sd, bp + ".norm1"),
            "attn": {
                "qkv_kernel": _np(sd[bp + ".attn.qkv.weight"]).T,
                "q_bias": _np(sd[bp + ".attn.q_bias"]),
                "v_bias": _np(sd[bp + ".attn.v_bias"]),
                "relative_position_bias_table":
                    resample_beit_rel_pos_table(table, old_grid, grid),
                "proj": linear(sd, bp + ".attn.proj"),
            },
            "gamma_1": _np(sd[bp + ".gamma_1"]),
            "gamma_2": _np(sd[bp + ".gamma_2"]),
            "norm2": layernorm(sd, bp + ".norm2"),
            "mlp_fc1": linear(sd, bp + ".mlp.fc1"),
            "mlp_fc2": linear(sd, bp + ".mlp.fc2"),
        }
    return params


def _beit_grid_from(nrel: int, n_tokens: int) -> Tuple[int, int]:
    """Solve (2h-1)(2w-1) == nrel, h*w == n_tokens for the grid."""
    for h in range(1, n_tokens + 1):
        if n_tokens % h:
            continue
        w = n_tokens // h
        if (2 * h - 1) * (2 * w - 1) == nrel:
            return (h, w)
    raise ValueError(f"inconsistent BEiT table: nrel={nrel}, "
                     f"tokens={n_tokens}")


def midas_scratch_params(sd: Mapping[str, Any], pre_prefix: str,
                         scratch_prefix: str) -> Dict[str, Any]:
    """MiDaS act_postprocess (under pretrained.) + scratch.* -> the flax
    MidasDPTHead ('scratch') params."""
    params: Dict[str, Any] = {}
    for i in range(4):
        ap = f"{pre_prefix}act_postprocess{i + 1}"
        params[f"readout_{i}"] = linear(sd, ap + ".0.project.0")
        params[f"project_{i}"] = conv(sd, ap + ".3")
    params["resize_0"] = conv_transpose(sd,
                                        pre_prefix + "act_postprocess1.4")
    params["resize_1"] = conv_transpose(sd,
                                        pre_prefix + "act_postprocess2.4")
    params["resize_3"] = conv(sd, pre_prefix + "act_postprocess4.4")
    sp = scratch_prefix
    for i in range(4):
        params[f"layer{i + 1}_rn"] = conv(sd, f"{sp}layer{i + 1}_rn")
        params[f"refinenet{i + 1}"] = _ffb(sd, f"{sp}refinenet{i + 1}")
    params["output_conv_0"] = conv(sd, sp + "output_conv.0")
    params["output_conv_2"] = conv(sd, sp + "output_conv.2")
    params["output_conv_4"] = conv(sd, sp + "output_conv.4")
    return params


def midas_dpt_beit_params(sd: Mapping[str, Any], depth: int,
                          grid: Tuple[int, int], prefix: str = ""
                          ) -> Dict[str, Any]:
    """Full MiDaS DPT-BEiT (torch.hub DPT_BEiT_L_384 layout) -> flax
    MidasDPTBEiT params."""
    return {
        "pretrained": beit_backbone_params(
            sd, depth, prefix + "pretrained.model.", grid),
        "scratch": midas_scratch_params(
            sd, prefix + "pretrained.", prefix + "scratch."),
    }


def zoedepth_beit_params(sd: Mapping[str, Any], depth: int,
                         grid: Tuple[int, int], prefix: str = ""
                         ) -> Dict[str, Any]:
    """Reference ZoeDepth (MidasCore/BEiT) state_dict -> flax ZoeDepthBEiT.

    Torch layout (model_io.py:27-96 checkpoints): core.core.pretrained.* +
    core.core.scratch.* (the hub midas under MidasCore.core), conv2.*, and
    the metric-bins head at top level."""
    p = prefix
    return {
        "core": midas_dpt_beit_params(sd, depth, grid, p + "core.core."),
        "conv2": conv(sd, p + "conv2"),
        "head": metric_bins_head_params(sd, p),
    }


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
