"""User-facing API tests: PatchFusion.from_config on the tiny config,
BaselinePretrain coarse/fine inference, reference-signature shim."""

import numpy as np
import pytest

import __graft_entry__ as graft
from patchfusion_tpu.api import BaselinePretrain, PatchFusion


@pytest.fixture(scope="module")
def tiny_model():
    return PatchFusion.from_config(graft._tiny_config())


def test_patchfusion_api_infer(tiny_model, rng):
    lr = rng.random((1, 42, 56, 3), dtype=np.float32)
    hr = rng.random((84, 112, 3), dtype=np.float32)
    d = tiny_model.infer(lr, hr, cai_mode="m1", process_num=2)
    assert d.shape == (84, 112)
    assert np.isfinite(d).all()
    # reference call signature shim (NCHW in, (1,1,H,W) out)
    depth, logs = tiny_model(mode="infer",
                             image_lr=np.moveaxis(lr, -1, 1),
                             image_hr=np.moveaxis(hr, -1, 0)[None],
                             cai_mode="m1", process_num=2)
    assert depth.shape == (1, 1, 84, 112)
    np.testing.assert_allclose(depth[0, 0], d, atol=1e-6)


def test_patchfusion_api_custom_tile_cfg(tiny_model, rng):
    # the reference's tile_cfg override (patchfusion.py:402-405)
    lr = rng.random((1, 42, 56, 3), dtype=np.float32)
    hr = rng.random((168, 224, 3), dtype=np.float32)
    d = tiny_model.infer(lr, hr, cai_mode="m1", process_num=2,
                         image_raw_shape=(168, 224),
                         patch_split_num=(4, 4))
    assert d.shape == (168, 224)


def test_baseline_pretrain_coarse(rng):
    cfg = graft._tiny_zoe()
    m = BaselinePretrain(cfg, 1e-3, 80, target="coarse",
                         image_raw_shape=(84, 112), patch_split_num=(2, 2),
                         patch_process_shape=(42, 56))
    lr = rng.random((1, 42, 56, 3), dtype=np.float32)
    d = m.infer(image_lr=lr)
    assert d.shape == (42, 56)
    assert np.isfinite(d).all()


def test_baseline_pretrain_fine_tiled(rng):
    cfg = graft._tiny_zoe()
    m = BaselinePretrain(cfg, 1e-3, 80, target="fine",
                         image_raw_shape=(84, 112), patch_split_num=(2, 2),
                         patch_process_shape=(42, 56))
    lr = rng.random((1, 42, 56, 3), dtype=np.float32)
    hr = rng.random((84, 112, 3), dtype=np.float32)
    d = m.infer(image_lr=lr, image_hr=hr, cai_mode="m2", process_num=2)
    assert d.shape == (84, 112)
    assert np.isfinite(d).all()
