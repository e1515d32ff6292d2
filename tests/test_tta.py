"""ZoeDepth TTA inference smoke: pad + flip augmentation produces finite
depth at the input resolution."""

import numpy as np

import __graft_entry__ as graft
from patchfusion_tpu.api import BaselinePretrain
from patchfusion_tpu.engine.tta import zoe_infer


def test_zoe_infer_pad_flip(rng):
    cfg = graft._tiny_zoe()
    m = BaselinePretrain(cfg, 1e-3, 80, target="coarse",
                         image_raw_shape=(84, 112), patch_split_num=(2, 2),
                         patch_process_shape=(42, 56))
    x = rng.random((1, 42, 56, 3), dtype=np.float32)

    def apply_fn(xx):
        return m.net.apply({"params": m.params}, xx)

    out = np.asarray(zoe_infer(apply_fn, x, pad_input=True,
                               with_flip_aug=True))
    assert out.shape == (1, 42, 56, 1)
    assert np.isfinite(out).all()
    out2 = np.asarray(zoe_infer(apply_fn, x, pad_input=False,
                                with_flip_aug=False))
    assert out2.shape == (1, 42, 56, 1)
