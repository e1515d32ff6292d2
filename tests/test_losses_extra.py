"""Extra loss tests: SSI least-squares alignment vs a torch oracle, Exist
loss formula, ranking-loss determinism under a fixed key."""

import jax
import numpy as np
import torch

from patchfusion_tpu.models.losses import (EdgeguidedRankingLoss, ExistLoss,
                                           ScaleAndShiftInvariantLoss)


def test_ssi_matches_torch_lstsq(rng):
    pred = rng.random((2, 12, 16, 1), dtype=np.float32)
    target = rng.random((2, 12, 16, 1), dtype=np.float32) * 5 + 1
    mask = (rng.random((2, 12, 16, 1)) > 0.2)

    ours = float(ScaleAndShiftInvariantLoss()(pred, target, mask))

    # torch oracle: per-image closed-form scale/shift then masked MSE
    tp = torch.from_numpy(pred[..., 0])
    tt = torch.from_numpy(target[..., 0])
    tm = torch.from_numpy(mask[..., 0].astype(np.float32))
    losses = []
    for i in range(2):
        p, t, m = tp[i], tt[i], tm[i]
        a00 = (m * p * p).sum()
        a01 = (m * p).sum()
        a11 = m.sum()
        b0 = (m * p * t).sum()
        b1 = (m * t).sum()
        det = a00 * a11 - a01 * a01
        s = (a11 * b0 - a01 * b1) / det
        sh = (-a01 * b0 + a00 * b1) / det
        res = (m * (s * p + sh - t) ** 2).sum() / m.sum()
        losses.append(res)
    golden = float(torch.stack(losses).mean())
    np.testing.assert_allclose(ours, golden, rtol=1e-4)


def test_exist_loss_formula(rng):
    pg = rng.random((1, 8, 8, 1), dtype=np.float32)
    cg = rng.random((1, 8, 8, 1), dtype=np.float32)
    mask = np.ones((1, 8, 8, 1), bool)
    ours = float(ExistLoss()(pg, cg, mask))
    golden = float(np.exp(-(pg - cg)).mean())
    np.testing.assert_allclose(ours, golden, rtol=1e-5)


def test_ranking_loss_deterministic(rng):
    inputs = rng.random((1, 32, 32, 1), dtype=np.float32) * 10
    targets = rng.random((1, 32, 32, 1), dtype=np.float32) * 10
    imgs = rng.random((1, 32, 32, 3), dtype=np.float32)
    gt = rng.random((1, 32, 32, 1), dtype=np.float32) * 70 + 1
    loss = EdgeguidedRankingLoss(point_pairs=32)
    k = jax.random.PRNGKey(3)
    a = float(loss(inputs, targets, imgs, gt, k))
    b = float(loss(inputs, targets, imgs, gt, k))
    c = float(loss(inputs, targets, imgs, gt, jax.random.PRNGKey(4)))
    assert a == b
    assert np.isfinite(a) and np.isfinite(c)
