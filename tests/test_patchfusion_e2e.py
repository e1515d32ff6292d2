"""End-to-end parity: the full TPU-native PatchFusion tiled inference
(m1 / m2 / rN modes, one compiled program each) vs the reference PatchFusion
Python-loop pipeline with identical random weights.

This exercises EVERYTHING at once: both ZoeDepth branches, G2L + guided
fusion, the PF decoder head, roi_align (incl. the reference's single
spatial_scale quirk), tile crop/resize semantics, Gaussian blend masks, and
the running-average stitching algebra."""

import numpy as np
import pytest
import torch

from patchfusion_tpu.convert.torch2jax import patchfusion_params
from patchfusion_tpu.engine.inference import PatchFusionInference
from patchfusion_tpu.models.builder import build_patchfusion

from . import torch_ref

SIZES = [(5, 7), (10, 13), (20, 26), (40, 52), (80, 104), (140, 182)]


def make_config():
    zoe = dict(torch_ref.ZOE_TEST_KW)
    zoe["type"] = "DA-ZoeDepth"
    zoe["img_size"] = [140, 182]
    return dict(
        image_raw_shape=(280, 364),
        patch_split_num=(2, 2),
        patch_process_shape=(140, 182),
        min_depth=1e-3,
        max_depth=80,
        coarse_branch=zoe,
        fine_branch=zoe,
        guided_fusion=dict(
            type="GuidedFusionPatchFusion",
            patch_process_shape=(140, 182),
            in_channels=[32, 64, 64, 64, 64, 64],
            num_patches=[h * w for (h, w) in SIZES[::-1]],
            n_channels=5,
            g2l=True),
        sigloss=dict(type="SILogLoss"))


@pytest.fixture(scope="module")
def models():
    config = make_config()
    tmodel = torch_ref.build_patchfusion_ref(config)
    params, stats = patchfusion_params(tmodel.state_dict(), vit_depth=12)
    net, tile_cfg = build_patchfusion(config)
    variables = {"params": params, "batch_stats": stats}
    return tmodel, net, tile_cfg, variables


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(3)
    image_hr = rng.random((1, 3, 280, 364), dtype=np.float32)
    # the dataset resizes the whole image to process res for the coarse pass
    t = torch.nn.functional.interpolate(
        torch.from_numpy(image_hr), (140, 182), mode="bilinear",
        align_corners=True)
    return image_hr, t.numpy()


@pytest.mark.parametrize("cai_mode", ["m1", "m2"])
def test_patchfusion_infer_parity(models, images, cai_mode):
    tmodel, net, tile_cfg, variables = models
    image_hr, image_lr = images

    with torch.no_grad():
        golden, _ = tmodel(mode="infer", image_lr=torch.from_numpy(image_lr),
                           image_hr=torch.from_numpy(image_hr),
                           cai_mode=cai_mode, process_num=2)
    engine = PatchFusionInference(net, variables, tile_cfg, process_num=2)
    depth = engine.infer(np.moveaxis(image_lr, 1, -1),
                         np.moveaxis(image_hr, 1, -1)[0], cai_mode=cai_mode)
    g = golden[0, 0].numpy()
    d = np.asarray(depth)
    assert d.shape == g.shape
    np.testing.assert_allclose(d, g, rtol=3e-3, atol=3e-3)


def test_patchfusion_infer_parity_random(models, images):
    tmodel, net, tile_cfg, variables = models
    image_hr, image_lr = images

    # deterministic "random" origins fed to both pipelines
    import random as pyrandom
    queue = [60, 135, 101]  # h1, h2, w for one group of process_num=2
    orig_randint = pyrandom.randint
    pyrandom.randint = lambda a, b: queue.pop(0)
    try:
        with torch.no_grad():
            golden, _ = tmodel(mode="infer",
                               image_lr=torch.from_numpy(image_lr),
                               image_hr=torch.from_numpy(image_hr),
                               cai_mode="r2", process_num=2)
    finally:
        pyrandom.randint = orig_randint

    engine = PatchFusionInference(net, variables, tile_cfg, process_num=2)
    rand_origins = np.array([[60, 101], [135, 101]], np.int32)
    depth = engine.infer(np.moveaxis(image_lr, 1, -1),
                         np.moveaxis(image_hr, 1, -1)[0], cai_mode="r2",
                         rand_origins=rand_origins)
    g = golden[0, 0].numpy()
    d = np.asarray(depth)
    assert d.shape == g.shape
    np.testing.assert_allclose(d, g, rtol=3e-3, atol=3e-3)
