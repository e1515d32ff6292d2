"""Fused log-binomial depth kernel vs the unfused reference math (pallas
interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchfusion_tpu.ops import pallas_head


def test_logbinomial_depth_matches_reference(rng, monkeypatch):
    b, oh, ow = 2, 56, 74
    ih, iw, k = 32, 42, 64
    p = rng.random((b, oh, ow), dtype=np.float32) * 0.98 + 0.01
    t = rng.random((b, oh, ow), dtype=np.float32)
    centers = (rng.random((b, ih, iw, k), dtype=np.float32) * 70 + 1)

    golden = np.asarray(pallas_head.logbinomial_depth_reference(
        p, t, centers))

    # interpret mode so the kernel runs on CPU
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    out = np.asarray(pallas_head.logbinomial_depth(
        p, t, centers, block_rows=8))
    assert out.shape == golden.shape
    np.testing.assert_allclose(out, golden, rtol=1e-4, atol=1e-4)
