"""Parity: flax DPTDinov2 vs the reference DPT_DINOv2 (Depth-Anything) with
identical random weights — relative depth output plus all six hook-tap
features (out_conv, l4_rn, r4, r3, r2, r1)."""

import numpy as np
import torch

from patchfusion_tpu.convert.torch2jax import dpt_dinov2_params
from patchfusion_tpu.models.dinov2 import VIT_CONFIGS
from patchfusion_tpu.models.dpt import DPTDinov2

from . import torch_ref


def test_dpt_dinov2_parity(rng):
    core = "vits"
    tmodel = torch_ref.build_dpt_dinov2(core)
    params = dpt_dinov2_params(tmodel.state_dict(),
                               VIT_CONFIGS[core]["depth"])

    h, w = 140, 182  # small multiple-of-14 input
    x = rng.standard_normal((1, 3, h, w), dtype=np.float32) * 0.5

    hooks = {}
    hh = [
        tmodel.depth_head.scratch.layer4_rn.register_forward_hook(
            lambda m, i, o: hooks.__setitem__("l4_rn", o)),
        tmodel.depth_head.scratch.refinenet1.register_forward_hook(
            lambda m, i, o: hooks.__setitem__("r1", o)),
        tmodel.depth_head.scratch.refinenet4.register_forward_hook(
            lambda m, i, o: hooks.__setitem__("r4", o)),
        list(tmodel.depth_head.scratch.output_conv2.children())[1]
        .register_forward_hook(
            lambda m, i, o: hooks.__setitem__("out_conv", o)),
    ]
    with torch.no_grad():
        gdepth = tmodel(torch.from_numpy(x))
    for hdl in hh:
        hdl.remove()

    model = DPTDinov2(core_type=core)
    depth, feats = model.apply({"params": params}, np.moveaxis(x, 1, -1))

    np.testing.assert_allclose(np.asarray(depth), gdepth.numpy(),
                               rtol=1e-4, atol=1e-4)
    for k in ["l4_rn", "r4", "r1", "out_conv"]:
        golden = np.moveaxis(hooks[k].numpy(), 1, -1)
        np.testing.assert_allclose(np.asarray(feats[k]), golden,
                                   rtol=1e-4, atol=1e-4, err_msg=k)
