"""Construct patchfusion_tpu networks from reference-style config dicts.

The reference configures everything through mmengine dicts
(configs/patchfusion_depthanything/*.py: `model=dict(type='PatchFusion',
config=dict(...))`). This builder accepts those exact dicts (loaded by
patchfusion_tpu.config.Config) and produces the flax modules + TileConfig.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from patchfusion_tpu.config.registry import MODELS
from patchfusion_tpu.models.patchfusion import PatchFusionNet, TileConfig
from patchfusion_tpu.models.zoedepth import make_zoe_branch

ZOE_KEYS = ("n_bins", "bin_centers_type", "bin_embedding_dim",
            "n_attractors", "attractor_alpha", "attractor_gamma",
            "attractor_kind", "attractor_type", "min_temp", "max_temp")

FUSION_KEYS = ("n_channels", "in_channels", "depth", "num_heads",
               "num_patches", "g2l")


def zoe_branch_kwargs(branch_cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Reference zoe_depth_config dict -> make_zoe_branch kwargs.

    'DA-ZoeDepth' selects the Depth-Anything (DINOv2) core; 'ZoeDepth'
    selects the MiDaS DPT_BEiT_L_384 core (reference zoedepth_v1.py:300-305
    falls through to MidasCore for non-vits/b/l midas_model_types)."""
    t = branch_cfg.get("type", "DA-ZoeDepth")
    if t not in ("DA-ZoeDepth", "ZoeDepth"):
        raise NotImplementedError(f"unknown branch type {t!r}")
    kw = {k: branch_cfg[k] for k in ZOE_KEYS if k in branch_cfg}
    if "n_attractors" in kw:
        kw["n_attractors"] = tuple(kw["n_attractors"])
    kw["core_type"] = branch_cfg.get(
        "midas_model_type", "DPT_BEiT_L_384" if t == "ZoeDepth" else "vitl")
    if t == "ZoeDepth":
        kw["core_family"] = "midas"
    return kw


def guided_fusion_kwargs(cfg: Dict[str, Any]) -> Dict[str, Any]:
    kw = {k: cfg[k] for k in FUSION_KEYS if k in cfg}
    for k in ("in_channels", "depth", "num_heads", "num_patches"):
        if k in kw:
            kw[k] = tuple(kw[k])
    return kw


@MODELS.register_module(name="PatchFusion")
def build_patchfusion(config: Dict[str, Any], dtype=jnp.float32
                      ) -> Tuple[PatchFusionNet, TileConfig]:
    """config = the reference PatchFusion config dict
    (configs/**/..._patchfusion_u4k.py model.config)."""
    tile_cfg = TileConfig(tuple(config["image_raw_shape"]),
                          tuple(config["patch_split_num"]),
                          tuple(config["patch_process_shape"]))
    net = PatchFusionNet(
        coarse=zoe_branch_kwargs(config["coarse_branch"]),
        fine=zoe_branch_kwargs(config["fine_branch"]),
        guided_fusion=guided_fusion_kwargs(config["guided_fusion"]),
        min_depth=config["min_depth"],
        max_depth=config["max_depth"],
        patch_process_shape=tuple(config["patch_process_shape"]),
        remat=bool(config.get("train_remat", False)),
        dtype=dtype)
    return net, tile_cfg


def build_zoedepth_branch(branch_cfg: Dict[str, Any], min_depth: float,
                          max_depth: float, dtype=jnp.float32):
    """Standalone coarse/fine branch (BaselinePretrain stages)."""
    return make_zoe_branch(zoe_branch_kwargs(branch_cfg), min_depth,
                           max_depth, dtype=dtype)
