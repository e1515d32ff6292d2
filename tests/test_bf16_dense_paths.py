"""The bf16 MXU formulations (dense-matrix resize, banded roi_align,
commuted CLB condition projection) must match the f32 bit-parity paths to
bf16 tolerance — these are the round-2 perf paths, so a regression here
would silently skew TPU inference. (BASELINE.md "Round-2 perf push".)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from patchfusion_tpu.ops.resize import interpolate
from patchfusion_tpu.ops.roi_align import roi_align_batched, roi_align_single


@pytest.mark.parametrize("size,mode,ac", [
    ((39, 51), "bilinear", True),
    ((39, 51), "bilinear", False),
    ((11, 17), "bilinear", True),   # downsample
    ((39, 51), "bicubic", False),
])
def test_resize_bf16_dense_matches_f32_taps(size, mode, ac):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 22, 29, 16)).astype(np.float32)
    ref = np.asarray(interpolate(jnp.asarray(x), size, mode=mode,
                                 align_corners=ac), np.float32)
    out = np.asarray(interpolate(jnp.asarray(x, jnp.bfloat16), size,
                                 mode=mode, align_corners=ac), np.float32)
    scale = np.abs(ref).max()
    assert np.max(np.abs(out - ref)) < 0.03 * max(scale, 1.0)


@pytest.mark.parametrize("fn,feat_shape", [
    (roi_align_single, (28, 37, 16)),
    (roi_align_batched, (3, 28, 37, 16)),
])
def test_roi_bf16_dense_matches_f32_taps(fn, feat_shape):
    rng = np.random.default_rng(1)
    f = rng.standard_normal(feat_shape).astype(np.float32)
    boxes = np.array([[1.2, 3.4, 20.0, 17.5],
                      [0.0, 0.0, 37.0, 28.0],
                      [5.5, 2.1, 30.3, 25.9]], np.float32)
    ref = np.asarray(fn(jnp.asarray(f), jnp.asarray(boxes), 28, 37, 1.0,
                        sampling_ratio=1), np.float32)
    out = np.asarray(fn(jnp.asarray(f, jnp.bfloat16), jnp.asarray(boxes),
                        28, 37, 1.0, sampling_ratio=1), np.float32)
    scale = np.abs(ref).max()
    assert np.max(np.abs(out - ref)) < 0.03 * max(scale, 1.0)


def test_clb_lowres_commute_matches_params_pt():
    """params_pt_lowres(x, c) == params_pt(x, up(c)) — the algebraic
    commute behind the fused head's low-res condition projection."""
    from patchfusion_tpu.models.zoedepth import ConditionalLogBinomial

    rng = np.random.default_rng(2)
    clb = ConditionalLogBinomial(33, 128, 64, 0.0212, 50.0,
                                 dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 56, 74, 33)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((2, 28, 37, 128)), jnp.float32)
    c_hi = interpolate(c, (56, 74), mode="bilinear", align_corners=True)
    v = clb.init(jax.random.PRNGKey(0), x, c_hi)
    p1, t1 = clb.apply(v, x, c_hi, method=ConditionalLogBinomial.params_pt)
    p2, t2 = clb.apply(v, x, c,
                       method=ConditionalLogBinomial.params_pt_lowres)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-6)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=2e-6)
