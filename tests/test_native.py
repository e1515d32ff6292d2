"""Native host-IO library: build, correctness vs numpy/torch references."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from patchfusion_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    lib = native._load()
    if lib is None:
        pytest.skip("native lib unavailable")
    return lib


def test_decode_bgr(lib, rng):
    buf = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    out = native.decode_bgr_u8(buf)
    golden = buf.astype(np.float32)[:, :, ::-1] / 255.0
    np.testing.assert_allclose(out, golden, atol=1e-7)


def test_load_raw(lib, rng, tmp_path):
    buf = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    p = tmp_path / "img.raw"
    buf.tofile(p)
    out = native.load_raw_bgr(str(p), 32, 48)
    golden = buf.astype(np.float32)[:, :, ::-1] / 255.0
    np.testing.assert_allclose(out, golden, atol=1e-7)


def test_resize_matches_torch(lib, rng):
    img = rng.random((540, 960, 3), dtype=np.float32)
    out = native.resize_bilinear_ac(img, 392, 518)
    golden = F.interpolate(torch.from_numpy(img).permute(2, 0, 1)[None],
                           (392, 518), mode="bilinear",
                           align_corners=True)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(out, golden, rtol=1e-5, atol=1e-5)


def test_crop_resize(lib, rng):
    img = rng.random((256, 384, 3), dtype=np.float32)
    out = native.crop_resize(img, 10, 20, 128, 192, 64, 96)
    golden = F.interpolate(
        torch.from_numpy(img[10:138, 20:212]).permute(2, 0, 1)[None],
        (64, 96), mode="bilinear", align_corners=True
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(out, golden, rtol=1e-5, atol=1e-5)
