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


def _interp(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)


def _clb_inputs(rng):
    b, oh, ow = 2, 56, 74
    ih, iw, k = 32, 42, 64
    cin, cc, h = 33, 128, 80
    last = rng.random((b, oh, ow, cin), dtype=np.float32) - 0.5
    cond = rng.random((b, ih, iw, cc), dtype=np.float32) - 0.5
    centers = rng.random((b, ih, iw, k), dtype=np.float32) * 70 + 1
    w1 = (rng.random((cin + cc, h), dtype=np.float32) - 0.5) * 0.2
    b1 = (rng.random((h,), dtype=np.float32) - 0.5)
    w2 = (rng.random((h, 4), dtype=np.float32) - 0.5) * 0.2
    b2 = (rng.random((4,), dtype=np.float32) - 0.5)
    return last, cond, centers, w1, b1, w2, b2


def test_clb_depth_fused_matches_reference(rng, monkeypatch):
    """Deep-fused CLB stage (projection+gelu+mlp2+softplus+logbinomial in
    one kernel) vs the unfused composition."""
    args = _clb_inputs(rng)
    golden = np.asarray(pallas_head.clb_depth_reference(*args))
    _interp(monkeypatch)
    out = np.asarray(pallas_head.clb_logbinomial_depth(
        *args, block_rows=8))
    assert out.shape == golden.shape
    np.testing.assert_allclose(out, golden, rtol=2e-4, atol=2e-4)


def test_clb_depth_fused_grad(rng, monkeypatch):
    """The fused CLB sits on the trainable PF-head path: its VJP must match
    the unfused composition's gradients for inputs AND weights.

    NOTE: the custom VJP internally recomputes clb_depth_reference, so the
    grad-vs-reference comparison validates wiring/argument order only. The
    finite-difference spot check at the end closes the loop: it probes the
    fused FORWARD directly, so a forward/backward inconsistency of the
    kernel itself (not just the VJP plumbing) would fail it."""
    args = tuple(jnp.asarray(a) for a in _clb_inputs(rng))
    _interp(monkeypatch)

    def loss_fused(*a):
        return (pallas_head.clb_logbinomial_depth(
            *a, block_rows=8) ** 2).sum()

    def loss_ref(*a):
        return (pallas_head.clb_depth_reference(*a) ** 2).sum()

    idx = tuple(range(len(args)))
    gf = jax.grad(loss_fused, argnums=idx)(*args)
    gr = jax.grad(loss_ref, argnums=idx)(*args)
    for a, g in zip(gf, gr):
        a, g = np.asarray(a), np.asarray(g)
        err = np.max(np.abs(a - g)) / max(np.max(np.abs(g)), 1e-9)
        assert err < 1e-3, err

    # central finite differences of the fused forward at a few weight
    # coordinates (w2 drives the p/t ratios — the most nonlinear path).
    # The squared loss is accumulated in f64 on the host (an on-device f32
    # sum quantizes to ~±2 at this loss magnitude, swamping h*grad)
    def loss64(a):
        d = np.asarray(pallas_head.clb_logbinomial_depth(
            *[jnp.asarray(x, jnp.float32) for x in a], block_rows=8),
            np.float64)
        return float((d ** 2).sum())

    f64 = [np.asarray(a, np.float64) for a in args]
    h = 3e-2
    for coord in [(0, 0), (3, 1), (5 % f64[5].shape[0], 3)]:
        plus = [a.copy() for a in f64]
        minus = [a.copy() for a in f64]
        plus[5][coord] += h
        minus[5][coord] -= h
        fd = (loss64(plus) - loss64(minus)) / (2 * h)
        an = float(np.asarray(gf[5])[coord])
        assert abs(fd - an) / max(abs(an), 1e-3) < 5e-2, (coord, fd, an)


def test_clb_pt_fused_matches_reference(rng, monkeypatch):
    """Fused (p, t) parameter stage (projection+upsample+gelu+mlp2 in one
    kernel, the DEFAULT bf16 head path) vs the unfused composition."""
    last, cond, _, w1, b1, w2, b2 = _clb_inputs(rng)
    args = (last, cond, w1, b1, w2, b2)
    gp, gt = pallas_head.clb_pt_reference(*args)
    _interp(monkeypatch)
    p, t = pallas_head.clb_pt(*args, block_rows=8)
    np.testing.assert_allclose(np.asarray(p), np.asarray(gp),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(gt),
                               rtol=2e-4, atol=2e-4)


def test_clb_pt_fused_grad(rng, monkeypatch):
    """clb_pt sits on the trainable PF-head path: its VJP must match the
    unfused composition's gradients for inputs AND weights. The VJP
    recomputes clb_pt_reference, so this validates wiring/argument order;
    the forward-vs-reference parity test above covers the kernel itself."""
    last, cond, _, w1, b1, w2, b2 = _clb_inputs(rng)
    args = tuple(jnp.asarray(a) for a in (last, cond, w1, b1, w2, b2))
    _interp(monkeypatch)

    def loss_fused(*a):
        p, t = pallas_head.clb_pt(*a, block_rows=8)
        return (p ** 2).sum() + (t ** 2).sum()

    def loss_ref(*a):
        p, t = pallas_head.clb_pt_reference(*a)
        return (p ** 2).sum() + (t ** 2).sum()

    idx = tuple(range(len(args)))
    gf = jax.grad(loss_fused, argnums=idx)(*args)
    gr = jax.grad(loss_ref, argnums=idx)(*args)
    for a, g in zip(gf, gr):
        a, g = np.asarray(a), np.asarray(g)
        err = np.max(np.abs(a - g)) / max(np.max(np.abs(g)), 1e-9)
        assert err < 1e-3, err


def test_logbinomial_depth_grad(rng, monkeypatch):
    """The fused head sits on the TRAINABLE fusion path (the PF-owned
    metric-bins head, patchfusion.py:386-397), so the --amp train step
    differentiates through it: the custom VJP must produce the reference
    formulation's gradients (regression for the round-4 amp-train crash)."""
    b, oh, ow = 1, 56, 74
    ih, iw, k = 32, 42, 64
    p = jnp.asarray(rng.random((b, oh, ow), dtype=np.float32) * 0.8 + 0.1)
    t = jnp.asarray(rng.random((b, oh, ow), dtype=np.float32))
    centers = jnp.asarray(
        rng.random((b, ih, iw, k), dtype=np.float32) * 70 + 1)

    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    def loss_fused(p_, t_, c_):
        return (pallas_head.logbinomial_depth(p_, t_, c_,
                                              block_rows=8) ** 2).sum()

    def loss_ref(p_, t_, c_):
        return (pallas_head.logbinomial_depth_reference(p_, t_, c_) ** 2
                ).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(p, t, centers)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(p, t, centers)
    for a, g in zip(gf, gr):
        a, g = np.asarray(a), np.asarray(g)
        # global relative error: the fused forward differs from the
        # reference by f32 reassociation, which the squared loss amplifies
        # elementwise; the gradient field must still match to ~1e-3 of its
        # own magnitude
        err = np.max(np.abs(a - g)) / max(np.max(np.abs(g)), 1e-9)
        assert err < 1e-3, err
