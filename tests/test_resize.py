"""Golden tests: ops.resize vs torch.nn.functional.interpolate.

Covers every flavor the pipeline uses (SURVEY.md §7 hard part 2):
bilinear ac=True (models), bilinear ac=False (eval), bicubic with explicit
scale_factor (DINOv2 pos-embed), nearest (AvgMap.resize).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from patchfusion_tpu.ops import interpolate


def _torch_resize(x_nhwc, size, mode, align_corners=None, scale=None):
    t = torch.from_numpy(np.ascontiguousarray(
        np.moveaxis(x_nhwc, -1, 1)))
    kwargs = {}
    if scale is not None:
        out = F.interpolate(t, scale_factor=scale, mode=mode,
                            align_corners=align_corners,
                            recompute_scale_factor=False)
    elif mode == "nearest":
        out = F.interpolate(t, size=size, mode=mode)
    else:
        out = F.interpolate(t, size=size, mode=mode,
                            align_corners=align_corners)
    return np.moveaxis(out.numpy(), 1, -1)


CASES = [
    # (in_hw, out_hw, mode, align_corners)
    ((540, 960), (392, 518), "bilinear", True),    # tile resizer (DA)
    ((540, 960), (384, 512), "bilinear", True),    # tile resizer (Zoe)
    ((14, 19), (28, 37), "bilinear", True),        # attractor/bin upsample
    ((392, 518), (2160, 3840), "bilinear", False),  # eval resize to GT
    ((98, 129), (196, 259), "bilinear", True),
    ((7, 9), (13, 17), "bilinear", True),
    ((13, 17), (7, 9), "bilinear", False),
    ((392, 518), (540, 960), "nearest", None),     # AvgMap.resize avg
    ((1568, 2072), (2160, 3840), "nearest", None),
]


@pytest.mark.parametrize("in_hw,out_hw,mode,ac", CASES)
def test_resize_matches_torch(rng, in_hw, out_hw, mode, ac):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(interpolate(x, out_hw, mode=mode,
                                  align_corners=bool(ac)))
    golden = _torch_resize(x, out_hw, mode, ac)
    # torch's CPU kernels compute source coordinates with path-dependent
    # precision (f32 for the ac=True paths, f64 lambdas in the non-AC
    # upsample); we match the model-internal ac=True paths bit-for-bit and
    # accept ~1e-4 absolute on the eval-only ac=False resize (depth range is
    # 80m, so this is ~1e-6 relative — far inside the 1e-3 parity budget).
    atol = 2e-5 if ac else 5e-4
    np.testing.assert_allclose(ours, golden, rtol=2e-5, atol=atol)


def test_bicubic_scale_factor_matches_torch(rng):
    # DINOv2 pos-embed interpolation: 37x37 grid -> (28+0.1)/37, (37+0.1)/37
    # scale factors, bicubic, align_corners=False, explicit scale_factor
    # (reference vision_transformer.py:194-205).
    x = rng.standard_normal((1, 37, 37, 64), dtype=np.float32)
    sx, sy = (28 + 0.1) / 37, (37 + 0.1) / 37
    golden = _torch_resize(x, None, "bicubic", False, scale=(sx, sy))
    out_hw = golden.shape[1:3]
    assert out_hw == (28, 37)
    ours = np.asarray(interpolate(x, out_hw, mode="bicubic",
                                  align_corners=False, scale=(sx, sy)))
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-4)


def test_bicubic_size_matches_torch(rng):
    x = rng.standard_normal((1, 24, 24, 8), dtype=np.float32)
    golden = _torch_resize(x, (37, 41), "bicubic", False)
    ours = np.asarray(interpolate(x, (37, 41), mode="bicubic",
                                  align_corners=False))
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-4)


def test_identity_resize(rng):
    x = rng.standard_normal((1, 8, 8, 2), dtype=np.float32)
    out = np.asarray(interpolate(x, (8, 8), mode="bilinear",
                                 align_corners=True))
    np.testing.assert_array_equal(out, x)


def test_net_resizer_sizes():
    from patchfusion_tpu.ops import NetResizer
    # DA resizer: 540x960 -> 392x518 exactly (multiple-of-14, minimal)
    r = NetResizer(518, 392, keep_aspect_ratio=False, ensure_multiple_of=14,
                   resize_method="minimal")
    assert r.get_size(540, 960) == (392, 518)
    # Zoe resizer: multiple-of-32 -> 384x512
    r = NetResizer(512, 384, keep_aspect_ratio=False, ensure_multiple_of=32,
                   resize_method="minimal")
    assert r.get_size(540, 960) == (384, 512)
    assert r.get_size(2160, 3840) == (384, 512)
