"""Parity: flax ZoeDepthDA vs the reference ZoeDepth (DA core, canonical
PatchFusion config: softplus bins, inv/mean attractors, alpha=1000) —
metric depth and all six temp_features taps."""

import numpy as np
import torch

from patchfusion_tpu.convert.torch2jax import zoedepth_params
from patchfusion_tpu.models.dinov2 import VIT_CONFIGS
from patchfusion_tpu.models.zoedepth import ZoeDepthDA

from . import torch_ref

TEMP_KEYS = ["x_d0", "x_blocks_feat_0", "x_blocks_feat_1", "x_blocks_feat_2",
             "x_blocks_feat_3", "midas_final_feat"]


def test_zoedepth_parity(rng):
    core = "vits"
    tmodel = torch_ref.build_zoedepth(core)
    params = zoedepth_params(tmodel.state_dict(),
                             VIT_CONFIGS[core]["depth"])

    h, w = 140, 182
    x = rng.random((1, 3, h, w), dtype=np.float32)
    with torch.no_grad():
        gold = tmodel(torch.from_numpy(x), return_final_centers=True)

    model = ZoeDepthDA(core_type=core, **{
        k: v for k, v in torch_ref.ZOE_TEST_KW.items()
        if k in ZoeDepthDA.__dataclass_fields__})
    out = model.apply({"params": params}, np.moveaxis(x, 1, -1))

    gdepth = gold["metric_depth"].numpy()  # (1,1,H,W)
    np.testing.assert_allclose(np.asarray(out["metric_depth"])[..., 0],
                               gdepth[:, 0], rtol=1e-3, atol=1e-4)
    for k in TEMP_KEYS:
        golden = np.moveaxis(gold["temp_features"][k].numpy(), 1, -1)
        np.testing.assert_allclose(np.asarray(out["temp_features"][k]),
                                   golden, rtol=1e-3, atol=1e-4, err_msg=k)
