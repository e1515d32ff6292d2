"""Extra loss tests: SSI least-squares alignment vs a torch oracle, Exist
loss formula, ranking-loss determinism under a fixed key."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
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


class TestRankingLossParity:
    """EdgeguidedRankingLoss vs the reference (losses.py:255-539) with
    injected sampling: the same anchors / distances / direction coin are fed
    to both implementations (VERDICT r1 item 7 — the controlled-randomness
    trick the rN e2e test uses)."""

    def _edges_mask_np(self, gray, strict):
        """numpy replica of reference getEdge + edge mask (losses.py:285-311)
        used only to map injected randint draws to anchor coordinates."""
        kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
        ky = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float32)
        h, w = gray.shape
        gx = np.zeros((h - 2, w - 2), np.float32)
        gy = np.zeros((h - 2, w - 2), np.float32)
        for i in range(3):
            for j in range(3):
                gx += kx[i, j] * gray[i:h - 2 + i, j:w - 2 + j]
                gy += ky[i, j] * gray[i:h - 2 + i, j:w - 2 + j]
        edges = np.zeros((h, w), np.float32)
        edges[1:-1, 1:-1] = np.sqrt(gx ** 2 + gy ** 2)
        return (edges >= 0.1 * edges.max()) & strict

    @pytest.mark.parametrize("reweight", [False, True])
    def test_parity_injected_sampling(self, monkeypatch, reweight):
        import math as _math
        import random as _pyrandom

        import torch

        from patchfusion_tpu.models.losses import EdgeguidedRankingLoss
        from . import torch_ref

        mod = torch_ref.load_ref_losses()
        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **k: self, raising=False)

        b, h, w, n_s = 2, 40, 52, 400
        rng = np.random.default_rng(7)
        inputs = (rng.random((b, 1, h, w)) * 5).astype(np.float32)
        targets = (rng.random((b, 1, h, w)) * 70 + 1).astype(np.float32)
        targets[0, 0, 5:8, 5:8] = 80.0  # exercise the pl-invalid mask
        images = rng.random((b, 3, h, w)).astype(np.float32)
        depth_gt = (rng.random((b, 1, h, w)) * 70 + 1).astype(np.float32)

        # precompute the anchor lists exactly as the reference does
        strict = ((depth_gt > -1e-3) & (depth_gt < 80)
                  & (targets != 80))[:, 0]
        anchors, dists = [], []
        for i in range(b):
            mask = self._edges_mask_np(images[i, 0], strict[i])
            loc = np.argwhere(mask)  # row-major == torch nonzero
            assert len(loc) > 0
            idx = rng.integers(0, len(loc), n_s)
            anchors.append(loc[idx])                      # (n_s, 2) rc
            dists.append(rng.integers(2, 31, (4, n_s)))
        ps = [0.3, 0.7]  # first image: direct branch; second: rotated

        # feed the reference the exact same draws
        queue = []
        for i in range(b):
            # edgeGuidedSampling calls randint(0, minlen, (n,)) then
            # randint(2, 31, (4, n)) per image (losses.py:321,337)
            mask = self._edges_mask_np(images[i, 0], strict[i])
            loc = np.argwhere(mask)
            # recover sample_index from anchors (invert loc[idx])
            lut = {tuple(rc): j for j, rc in enumerate(loc)}
            sample_index = np.array([lut[tuple(rc)] for rc in anchors[i]])
            queue.append(torch.from_numpy(sample_index).long())
            queue.append(torch.from_numpy(dists[i]).long())

        def fake_randint(*args, **kw):
            return queue.pop(0)

        p_queue = list(ps)
        monkeypatch.setattr(torch, "randint", fake_randint)
        monkeypatch.setattr(_pyrandom, "random", lambda: p_queue.pop(0))

        ref = mod.EdgeguidedRankingLoss(point_pairs=n_s,
                                        reweight_target=reweight)
        ref_loss, _ = ref(torch.from_numpy(inputs),
                          torch.from_numpy(targets),
                          torch.from_numpy(images),
                          torch.from_numpy(depth_gt))

        jl = EdgeguidedRankingLoss(point_pairs=n_s, reweight_target=reweight)
        got = jl(jnp.asarray(np.moveaxis(inputs, 1, -1)),
                 jnp.asarray(np.moveaxis(targets, 1, -1)),
                 jnp.asarray(np.moveaxis(images, 1, -1)),
                 jnp.asarray(np.moveaxis(depth_gt, 1, -1)),
                 anchor_rc=jnp.asarray(np.stack(anchors)),
                 dist=jnp.asarray(np.stack(dists), jnp.float32),
                 direct_p=jnp.asarray(ps))
        assert _math.isfinite(float(ref_loss))
        np.testing.assert_allclose(float(got), float(ref_loss),
                                   rtol=2e-4, atol=2e-5)
