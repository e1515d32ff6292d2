"""End-to-end parity for the BaselinePretrain paths (reference
baseline_pretrain.py:364-419): coarse single-pass inference and the
fine-only tiled pipeline (tile_temp=None; the minimal tiling slice) vs the
reference with shared random weights."""

import numpy as np
import pytest
import torch

from patchfusion_tpu.api import BaselinePretrain
from patchfusion_tpu.convert.torch2jax import zoedepth_params

from . import torch_ref


@pytest.fixture(scope="module")
def setup():
    zoe = dict(torch_ref.ZOE_TEST_KW)
    zoe["type"] = "DA-ZoeDepth"
    zoe["img_size"] = [140, 182]
    return zoe


def test_coarse_pretrain_parity(setup, rng):
    zoe = setup
    tmodel = torch_ref.build_baseline_pretrain_ref(
        zoe, "coarse", (280, 364), (2, 2), (140, 182))
    params = zoedepth_params(tmodel.coarse_branch.state_dict(), 12)

    lr = rng.random((1, 3, 140, 182), dtype=np.float32)
    with torch.no_grad():
        golden, _ = tmodel(mode="infer", image_lr=torch.from_numpy(lr),
                           image_hr=None, depth_gt=None)

    model = BaselinePretrain(zoe, 1e-3, 80, target="coarse",
                             image_raw_shape=(280, 364),
                             patch_split_num=(2, 2),
                             patch_process_shape=(140, 182), params=params)
    d = model.infer(image_lr=np.moveaxis(lr, 1, -1))
    np.testing.assert_allclose(d, golden[0, 0].numpy(), rtol=2e-3,
                               atol=2e-3)


def test_fine_pretrain_tiled_parity(setup, rng):
    zoe = setup
    tmodel = torch_ref.build_baseline_pretrain_ref(
        zoe, "fine", (280, 364), (2, 2), (140, 182))
    params = zoedepth_params(tmodel.fine_branch.state_dict(), 12)

    hr = rng.random((1, 3, 280, 364), dtype=np.float32)
    lr = torch.nn.functional.interpolate(
        torch.from_numpy(hr), (140, 182), mode="bilinear",
        align_corners=True).numpy()
    with torch.no_grad():
        golden, _ = tmodel(mode="infer", image_lr=torch.from_numpy(lr),
                           image_hr=torch.from_numpy(hr), depth_gt=None,
                           cai_mode="m2", process_num=2)

    model = BaselinePretrain(zoe, 1e-3, 80, target="fine",
                             image_raw_shape=(280, 364),
                             patch_split_num=(2, 2),
                             patch_process_shape=(140, 182), params=params)
    d = model.infer(image_lr=np.moveaxis(lr, 1, -1),
                    image_hr=np.moveaxis(hr, 1, -1)[0], cai_mode="m2",
                    process_num=2)
    g = golden[0, 0].numpy()
    assert d.shape == g.shape
    np.testing.assert_allclose(d, g, rtol=3e-3, atol=3e-3)
