"""Hub export/import round trip (VERDICT r1 item 6).

Closes the checkpoint-fidelity loop the zero-egress environment allows:
  jax params -> jax2torch.patchfusion_state_dict -> HF snapshot dir
  (config.json + pytorch_model.bin, the reference convert_huggingface.py
  layout) -> PatchFusion.from_pretrained(dir) -> identical outputs,
plus the reverse-converter completeness claim: the exported state_dict
loads into the actual reference PatchFusion with strict=True
(reference tools/convert_huggingface.py:56-80, patchfusion.py:56-78).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from patchfusion_tpu.convert.jax2torch import patchfusion_state_dict
from patchfusion_tpu.convert.torch2jax import patchfusion_params
from patchfusion_tpu.models.builder import build_patchfusion
from patchfusion_tpu.models.patchfusion import PatchFusionNet

from . import torch_ref
from .test_patchfusion_e2e import make_config


@pytest.fixture(scope="module")
def setup():
    config = make_config()
    tmodel = torch_ref.build_patchfusion_ref(config)
    params, stats = patchfusion_params(tmodel.state_dict(), vit_depth=12)
    net, tile_cfg = build_patchfusion(config)
    variables = {"params": params, "batch_stats": stats}
    return config, tmodel, net, tile_cfg, variables


def _export_dir(tmp_path, config, variables):
    """Write the HF snapshot layout exactly as tools/export_hub.py does."""
    sd = patchfusion_state_dict(variables["params"],
                                variables.get("batch_stats", {}),
                                vit_depth=12, fusion_only=False)
    out = tmp_path / "hub_export"
    os.makedirs(out, exist_ok=True)
    torch.save({k: torch.from_numpy(np.asarray(v).copy())
                for k, v in sd.items()}, out / "pytorch_model.bin")
    with open(out / "config.json", "w") as f:
        json.dump({"config": config}, f, indent=2, default=str)
    return str(out), sd


def test_export_then_from_pretrained_identical(setup, tmp_path):
    config, _, net, tile_cfg, variables = setup
    path, _ = _export_dir(tmp_path, config, variables)

    from patchfusion_tpu.api import PatchFusion
    model = PatchFusion.from_pretrained(path)
    assert model.tile_cfg.patch_raw_shape == tile_cfg.patch_raw_shape

    rng = np.random.default_rng(0)
    image_lr = jnp.asarray(rng.random((1, 140, 182, 3), np.float32))
    crops = jnp.asarray(rng.random((2, 140, 182, 3), np.float32))
    bboxs = jnp.asarray([[0., 0., 182., 140.], [100., 80., 282., 220.]],
                        jnp.float32)

    def fwd(n, v):
        return n.apply(v, image_lr, crops, bboxs,
                       method=PatchFusionNet.train_forward, train=False)

    ref = np.asarray(fwd(net, variables))
    got = np.asarray(fwd(model.net, model.variables))
    np.testing.assert_array_equal(got, ref)


def test_exported_state_dict_loads_reference_strict(setup, tmp_path):
    """convert/jax2torch.py claims the export is loadable by the reference
    with strict=True — prove it on the real reference module."""
    config, tmodel, _, _, variables = setup
    _, sd = _export_dir(tmp_path, config, variables)
    missing_unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
        strict=True)
    assert not missing_unexpected.missing_keys
    assert not missing_unexpected.unexpected_keys


def test_fusion_only_save_load_dict(setup, tmp_path):
    """Reference three-part checkpoint semantics: fusion-only save
    (get_save_dict strips the branches) merges back with strict=False
    load_dict and reproduces outputs."""
    config, _, net, tile_cfg, variables = setup
    from patchfusion_tpu.api import PatchFusion
    model = PatchFusion(net, tile_cfg, {
        "params": dict(variables["params"]),
        "batch_stats": variables.get("batch_stats", {})}, config)
    p = str(tmp_path / "fusion_only.msgpack")
    model.save(p)

    # perturb the fusion weights, then load_dict must restore them
    import jax
    model.variables["params"]["fusion_conv_0"] = jax.tree.map(
        lambda x: x + 1.0, model.variables["params"]["fusion_conv_0"])
    model.load_dict(p)
    np.testing.assert_array_equal(
        np.asarray(model.variables["params"]["fusion_conv_0"]["kernel"]),
        np.asarray(variables["params"]["fusion_conv_0"]["kernel"]))
