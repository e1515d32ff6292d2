"""Checkpoint conversion between the reference torch layouts and flax.

`branch_conversion_spec` is the single source of truth for how a model
config's branch family maps onto converter arguments: the DA (DINOv2)
family needs the ViT depth, the midas (BEiT) family additionally needs the
static rel-pos grid of the process shape (models/beit.py sizes the bias
table at trace time; reference midas.py:293-345 / model_io.py:27-96).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple


def branch_conversion_spec(model_config: Dict[str, Any]
                           ) -> Tuple[str, int, Optional[Tuple[int, int]]]:
    """model.config dict -> (family, backbone depth, beit grid or None).

    family: 'da' (type='DA-ZoeDepth', DINOv2 core) or 'midas'
    (type='ZoeDepth', BEiT core — reference zoedepth_v1.py:300-305).
    The BEiT grid is patch_process_shape // 16 (patch size of BEiT-L/16).
    """
    branch = model_config["coarse_branch"]
    if branch.get("type", "DA-ZoeDepth") == "ZoeDepth":
        from patchfusion_tpu.models.beit import BEIT_CONFIGS
        mt = branch.get("midas_model_type", "DPT_BEiT_L_384")
        pph, ppw = model_config["patch_process_shape"]
        return "midas", BEIT_CONFIGS[mt]["depth"], (pph // 16, ppw // 16)
    from patchfusion_tpu.models.dinov2 import VIT_CONFIGS
    mt = branch.get("midas_model_type", "vitl")
    return "da", VIT_CONFIGS[mt]["depth"], None
