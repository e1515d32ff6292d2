"""Tests: config loader (_base_ inheritance, _refer_, cfg-options merge),
sharded loader, metrics vs reference formulas, SILog loss vs torch oracle,
tile grid math vs reference prepare_tile_cfg."""

import os

import numpy as np
import pytest

from patchfusion_tpu.config import Config, parse_cfg_option

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_config_inheritance_and_refer():
    cfg = Config.fromfile(os.path.join(
        REPO, "configs/patchfusion_depthanything/"
              "depthanything_vits_patchfusion_u4k.py"))
    mc = cfg.model["config"]
    assert mc["coarse_branch"]["midas_model_type"] == "vits"
    assert mc["coarse_branch"]["type"] == "DA-ZoeDepth"
    assert mc["coarse_branch"]["n_bins"] == 64  # from _base_ zoe config
    assert mc["guided_fusion"]["in_channels"][1] == 64
    assert mc["patch_process_shape"] == (392, 518)
    # dataloader override propagated
    assert cfg.train_dataloader["dataset"]["transform_cfg"][
        "network_process_size"] == [392, 518]


def test_cfg_options_merge():
    cfg = Config.fromfile(os.path.join(
        REPO, "configs/patchfusion_depthanything/"
              "depthanything_vitl_patchfusion_u4k.py"))
    cfg.merge_from_dict({"model.config.patch_split_num":
                         parse_cfg_option("2,2"),
                         "train_cfg.max_epochs": parse_cfg_option("4")})
    assert cfg.model["config"]["patch_split_num"] == (2, 2)
    assert cfg.train_cfg["max_epochs"] == 4


def test_tile_config_matches_reference():
    from patchfusion_tpu.models.patchfusion import TileConfig
    tc = TileConfig((2160, 3840), (4, 4), (392, 518))
    # reference prepare_tile_cfg (baseline_pretrain.py:91-119)
    assert tc.patch_raw_shape == (540, 960)
    assert tc.patch_reensemble_shape == (392 * 4, 518 * 4)
    oh, ow = tc.regular_origins((0, 0))
    assert oh == [0, 540, 1080, 1620] and ow == [0, 960, 1920, 2880]
    oh, ow = tc.regular_origins((270, 480))
    assert len(oh) == 3 and len(ow) == 3  # m2 shifted pass: 9 tiles
    # m2 tile counts: 16 + 12 + 12 + 9 = 49 (the paper's p49)
    total = 16
    for off in [(0, 480), (270, 0), (270, 480)]:
        a, b = tc.regular_origins(off)
        total += len(a) * len(b)
    assert total == 49


def test_sharded_sampler_partition():
    from patchfusion_tpu.data.loader import ShardedSampler
    n, world = 77, 8
    seen = []
    for r in range(world):
        s = ShardedSampler(n, world, r, shuffle=False)
        seen += s.indices()
    assert len(seen) == -(-n // world) * world
    assert set(seen) == set(range(n))


def test_loader_prefetch_and_collate():
    from patchfusion_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((4, 4), i, np.float32),
                    "img_file_basename": f"img{i}"}

    dl = DataLoader(DS(), batch_size=3, num_workers=2)
    batches = list(dl)
    assert len(batches) == 4
    assert batches[0]["x"].shape == (3, 4, 4)
    assert batches[0]["img_file_basename"] == ["img0", "img1", "img2"]


def test_silog_matches_torch(rng):
    import torch
    from patchfusion_tpu.models.losses import SILogLoss

    pred = rng.random((2, 16, 20, 1), dtype=np.float32) * 10 + 0.1
    target = rng.random((2, 16, 20, 1), dtype=np.float32) * 90
    ours = float(SILogLoss()(pred, target, 1e-3, 80.0))

    # the reference formula (losses.py:41-46) on the masked pixels
    tp = torch.from_numpy(pred)
    tt = torch.from_numpy(target)
    mask = (tt > 1e-3) & (tt < 80.0)
    g = torch.log(tp[mask] + 1e-7) - torch.log(tt[mask] + 1e-7)
    golden = 10 * torch.sqrt(torch.var(g) + 0.15 * torch.mean(g) ** 2)
    np.testing.assert_allclose(ours, float(golden), rtol=1e-5)


def test_silog_additional_mask_fallback(rng):
    """Reference losses.py:30-36: when mask & additional_mask covers
    < 0.1% of the pred's pixels, SILog reverts to the plain validity mask
    ('reduce to previous mask for stable training')."""
    import torch
    from patchfusion_tpu.models.losses import SILogLoss

    pred = rng.random((2, 16, 20, 1), dtype=np.float32) * 10 + 0.1
    target = rng.random((2, 16, 20, 1), dtype=np.float32) * 90

    def golden(am):
        tp, tt = torch.from_numpy(pred), torch.from_numpy(target)
        mask = (tt > 1e-3) & (tt < 80.0)
        merged = mask & torch.from_numpy(am)
        if merged.sum() >= 16 * 20 * 0.001:
            mask = merged
        g = torch.log(tp[mask] + 1e-7) - torch.log(tt[mask] + 1e-7)
        return float(10 * torch.sqrt(torch.var(g)
                                     + 0.15 * torch.mean(g) ** 2))

    # generous additional mask -> merged mask used
    am_big = rng.random((2, 16, 20, 1)) > 0.5
    ours = float(SILogLoss()(pred, target, 1e-3, 80.0,
                             additional_mask=am_big))
    np.testing.assert_allclose(ours, golden(am_big), rtol=1e-5)

    # near-empty additional mask (0 valid px < 0.32 threshold) -> fallback
    am_tiny = np.zeros((2, 16, 20, 1), bool)
    ours = float(SILogLoss()(pred, target, 1e-3, 80.0,
                             additional_mask=am_tiny))
    np.testing.assert_allclose(ours, golden(am_tiny), rtol=1e-5)
    # and the fallback equals the no-additional-mask loss
    plain = float(SILogLoss()(pred, target, 1e-3, 80.0))
    np.testing.assert_allclose(ours, plain, rtol=1e-6)


def test_ranking_loss_registered():
    """ADVICE r2: the decorator was re-targeted onto a helper, dropping
    EdgeguidedRankingLoss from the registry."""
    from patchfusion_tpu.config.registry import MODELS
    from patchfusion_tpu.models import losses  # noqa: F401 (registration)
    assert MODELS.get("EdgeguidedRankingLoss") is losses.EdgeguidedRankingLoss
    assert MODELS.get("SILogLoss") is losses.SILogLoss


def test_metrics_match_reference_formulas(rng):
    from patchfusion_tpu.utils.metrics import compute_metrics
    gt = rng.random((64, 96), dtype=np.float32) * 70 + 1
    pred = gt * (1 + 0.05 * rng.standard_normal((64, 96),
                                                dtype=np.float32))
    edges = rng.random((64, 96)) > 0.9
    m = compute_metrics(gt, pred, min_depth_eval=1e-3, max_depth_eval=80,
                        garg_crop=False, eigen_crop=False, dataset="",
                        disp_gt_edges=edges)
    for k in ("a1", "a2", "a3", "abs_rel", "rmse", "log_10", "rmse_log",
              "silog", "sq_rel", "see"):
        assert k in m and np.isfinite(m[k]), k
    assert 0.9 < m["a1"] <= 1.0
    assert m["abs_rel"] < 0.1


def test_synth_demo_splits_exist(tmp_path, monkeypatch):
    """Regression (VERDICT r3): the demo training config referenced a
    train_x16.txt split that tools/make_synth_u4k.py never wrote. Generate a
    tiny synth dataset and assert every split file the demo config points at
    exists under the generated root."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_synth_u4k

    root = str(tmp_path / "u4k_synth")
    monkeypatch.setattr(sys, "argv", [
        "make_synth_u4k.py", "--root", root, "--n-train", "2", "--n-val",
        "1", "--height", "96", "--width", "160"])
    make_synth_u4k.main()

    cfg = Config.fromfile(os.path.join(
        REPO, "configs/demo/train_fusion_synth_vitl.py"))
    for dl in (cfg.train_dataloader, cfg.val_dataloader):
        split = dl["dataset"]["split"]
        local = os.path.join(root, os.path.basename(split))
        assert os.path.isfile(local), f"{os.path.basename(split)} missing"
        with open(local) as f:
            assert len(f.read().splitlines()) > 0
    # the oversampled list is the train list repeated
    with open(os.path.join(root, "train_x16.txt")) as f:
        assert len(f.read().splitlines()) == 2 * 16


def test_gaussian_blend_and_pfm_roundtrip(tmp_path, rng):
    from patchfusion_tpu.data.pfm import read_pfm
    data = rng.random((8, 10), dtype=np.float32)
    path = tmp_path / "x.pfm"
    with open(path, "wb") as f:
        f.write(b"Pf\n10 8\n-1.0\n")
        np.flipud(data).astype("<f4").tofile(f)
    out, scale = read_pfm(str(path))
    np.testing.assert_array_equal(out, data)
    assert scale == 1.0
