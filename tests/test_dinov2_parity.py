"""Numerical parity: flax DinoViT vs the reference PyTorch DINOv2 with the
same (random) weights, including arbitrary-size pos-embed interpolation and
the get_intermediate_layers feature taps."""

import numpy as np
import pytest
import torch

from patchfusion_tpu.convert.torch2jax import dinovit_params
from patchfusion_tpu.models.dinov2 import VIT_CONFIGS, build_dinovit

from . import torch_ref


@pytest.mark.parametrize("hw", [(126, 154), (392, 518)])
def test_dinovit_intermediate_layers_parity(rng, hw):
    core = "vits"
    tmodel = torch_ref.build_dinov2(core)
    sd = tmodel.state_dict()
    depth = VIT_CONFIGS[core]["depth"]
    params = dinovit_params(sd, depth)

    h, w = hw
    x = rng.standard_normal((1, 3, h, w), dtype=np.float32) * 0.5
    with torch.no_grad():
        golden = tmodel.get_intermediate_layers(
            torch.from_numpy(x), 4, return_class_token=True)

    model = build_dinovit(core)
    x_nhwc = np.moveaxis(x, 1, -1)
    outs = model.apply({"params": params}, x_nhwc, n_taps=4)

    assert len(outs) == len(golden) == 4
    for (tok, cls), (gtok, gcls) in zip(outs, golden):
        np.testing.assert_allclose(np.asarray(tok), gtok.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cls), gcls.numpy(),
                                   rtol=1e-4, atol=1e-4)
