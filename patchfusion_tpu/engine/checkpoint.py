"""Checkpoint IO.

Preserves the reference's three-part checkpoint structure (SURVEY §5):
coarse ckpt + fine ckpt (strict, per branch) and a fusion-only ckpt
(get_save_dict strips the frozen branches, reference patchfusion.py:179-187).

Two formats:
  * native: msgpack via flax.serialization, holding
    {params-or-subtree, batch_stats, opt_state, epoch};
  * torch `.pth` import: `load_torch_checkpoint` reads the reference's
    {'model_state_dict': ...} files (tools/train.py save format,
    trainer.py:274-292) and converts through convert/torch2jax.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _to_numpy_tree(tree):
    import jax
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state, epoch: int,
                    fusion_only: bool = True) -> None:
    """Save a TrainState. fusion_only mirrors the reference's
    get_save_dict: the frozen branches are NOT written (they load from
    their own stage-1/2 checkpoints)."""
    from flax import serialization

    payload = {
        "epoch": epoch,
        "trainable": _to_numpy_tree(state.trainable),
        "batch_stats": _to_numpy_tree(state.batch_stats),
        # optax states are nested NamedTuples; flatten to a pure state dict
        "opt_state": serialization.to_state_dict(
            _to_numpy_tree(state.opt_state)),
        "step": int(state.step),
    }
    if not fusion_only:
        payload["frozen"] = _to_numpy_tree(state.frozen)
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    from flax import serialization
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_opt_state(template, blob_opt_state):
    """Rebuild the optax NamedTuple state from its serialized state dict
    using a freshly-initialized state as the structure template."""
    from flax import serialization
    return serialization.from_state_dict(template, blob_opt_state)


def save_params(path: str, params, batch_stats=None) -> None:
    """Inference-weights export (the convert_huggingface.py analogue)."""
    from flax import serialization
    payload = {"params": _to_numpy_tree(params)}
    if batch_stats is not None:
        payload["batch_stats"] = _to_numpy_tree(batch_stats)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_params(path: str) -> Dict[str, Any]:
    from flax import serialization
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


# -- torch .pth interop ------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Read a reference `.pth` checkpoint's model_state_dict as numpy
    (torch CPU required only here, at the conversion boundary)."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model_state_dict", blob)
    return {k: v.numpy() if hasattr(v, "numpy") else v
            for k, v in sd.items()}


def load_patchfusion_from_torch(coarse_path: str, fine_path: str,
                                fusion_path: Optional[str], vit_depth: int,
                                fusion_depths=(2, 2, 3, 3, 4, 4),
                                family: str = "da", grid=None
                                ) -> Tuple[Dict, Dict]:
    """Assemble full PatchFusionNet variables from the reference's three
    checkpoints (patchfusion.py:105-109 branch loads + load_dict
    strict=False fusion load). family/grid: see
    convert.branch_conversion_spec ('midas' = the BEiT zoedepth family)."""
    from patchfusion_tpu.convert.torch2jax import (branch_params,
                                                   fusion_only_params)

    params: Dict[str, Any] = {
        "coarse_branch": branch_params(
            load_torch_state_dict(coarse_path), vit_depth,
            family=family, grid=grid),
        "fine_branch": branch_params(
            load_torch_state_dict(fine_path), vit_depth,
            family=family, grid=grid),
    }
    stats: Dict[str, Any] = {}
    if fusion_path:
        fparams, fstats = fusion_only_params(
            load_torch_state_dict(fusion_path), fusion_depths)
        params.update(fparams)
        stats.update(fstats)
    return params, stats


def load_patchfusion_hub_dir(path: str, vit_depth: int,
                             fusion_depths=(2, 2, 3, 3, 4, 4),
                             family: str = "da", grid=None
                             ) -> Tuple[Dict, Dict]:
    """Load from a HuggingFace-format local snapshot (the from_pretrained
    layout produced by the reference tools/convert_huggingface.py:
    pytorch_model.bin / model.safetensors with the FULL state_dict)."""
    from patchfusion_tpu.convert.torch2jax import patchfusion_params

    for name in ("pytorch_model.bin", "model.safetensors"):
        p = os.path.join(path, name)
        if os.path.exists(p):
            if name.endswith(".safetensors"):
                from safetensors.numpy import load_file
                sd = load_file(p)
            else:
                sd = load_torch_state_dict(p)
            return patchfusion_params(sd, vit_depth, fusion_depths,
                                      family=family, grid=grid)
    raise FileNotFoundError(f"no checkpoint found under {path}")
