"""UnrealStereo4kDataset on synthesized on-disk data: split parsing,
extrinsics -> depth_factor, raw decode, train augs/crop/bbox, infer-mode
boundary output."""

import os

import numpy as np
import pytest

from patchfusion_tpu.data.u4k import UnrealStereo4kDataset


@pytest.fixture(scope="module")
def u4k_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("u4k")
    rng = np.random.default_rng(0)
    img_dir = root / "scene" / "Image0"
    disp_dir = root / "scene" / "Disp0"
    ext0_dir = root / "scene" / "Extrinsics0"
    ext1_dir = root / "scene" / "Extrinsics1"
    for d in (img_dir, disp_dir, ext0_dir, ext1_dir):
        os.makedirs(d)
    img = rng.integers(0, 255, (2160, 3840, 3), np.uint8)
    img.tofile(img_dir / "00000.raw")
    disp = (rng.random((2160, 3840), np.float32) * 50 + 1).astype(np.float32)
    np.save(disp_dir / "00000.npy", disp)
    # focal 100, baselines differing by 0.5 -> depth_factor = 50
    (ext0_dir / "00000.txt").write_text("100.0 0 0\n0 0 0 1.0\n")
    (ext1_dir / "00000.txt").write_text("100.0 0 0\n0 0 0 1.5\n")
    split = root / "split.txt"
    split.write_text("scene/Image0/00000.png x scene/Disp0/00000.npy y\n")
    return root, disp


def test_u4k_infer_mode(u4k_root):
    root, disp = u4k_root
    ds = UnrealStereo4kDataset(
        mode="infer", data_root=str(root), split=str(root / "split.txt"),
        transform_cfg=dict(network_process_size=[392, 518]),
        min_depth=1e-3, max_depth=80, resize_mode="depth-anything")
    assert len(ds) == 1
    assert ds.data_infos[0]["depth_factor"] == pytest.approx(50.0)
    s = ds[0]
    assert s["image_hr"].shape == (2160, 3840, 3)
    assert s["image_lr"].shape == (392, 518, 3)
    assert s["depth_gt"].shape == (2160, 3840, 1)
    np.testing.assert_allclose(s["depth_gt"][..., 0], 50.0 / disp,
                               rtol=1e-5)
    assert s["boundary"].shape == (2160, 3840)
    assert 0 <= s["image_hr"].min() and s["image_hr"].max() <= 1.0


def test_u4k_train_mode(u4k_root):
    root, _ = u4k_root
    ds = UnrealStereo4kDataset(
        mode="train", data_root=str(root), split=str(root / "split.txt"),
        transform_cfg=dict(degree=1.0, random_crop=True,
                           network_process_size=[392, 518]),
        min_depth=1e-3, max_depth=80, resize_mode="depth-anything",
        patch_raw_shape=(540, 960))
    s = ds[0]
    assert s["image_lr"].shape == (392, 518, 3)
    assert s["crops_image_hr"].shape == (392, 518, 3)
    assert s["crop_depths"].shape == (540, 960, 1)
    x1, y1, x2, y2 = s["bboxs"]
    assert x2 - x1 == 960 and y2 - y1 == 540
    assert 0 <= y1 <= 2160 - 540 and 0 <= x1 <= 3840 - 960


def test_u4k_nonstandard_raw_shape(tmp_path):
    """Raw image shape follows the GT disparity shape (synthetic/toy
    datasets at non-4K resolutions; tools/make_synth_u4k.py --height/
    --width)."""
    rng = np.random.default_rng(1)
    for sub in ("Image0", "Disp0", "Extrinsics0", "Extrinsics1"):
        os.makedirs(tmp_path / "s" / sub)
    h, w = 84, 112
    rng.integers(0, 255, (h, w, 3), np.uint8).tofile(
        tmp_path / "s" / "Image0" / "0.raw")
    disp = (rng.random((h, w), np.float32) * 50 + 1).astype(np.float32)
    np.save(tmp_path / "s" / "Disp0" / "0.npy", disp)
    (tmp_path / "s" / "Extrinsics0" / "0.txt").write_text(
        "100.0 0 0\n0 0 0 1.0\n")
    (tmp_path / "s" / "Extrinsics1" / "0.txt").write_text(
        "100.0 0 0\n0 0 0 1.5\n")
    (tmp_path / "split.txt").write_text(
        "s/Image0/0.png x s/Disp0/0.npy y\n")
    for mode, cfg in (("infer", dict(network_process_size=[42, 56])),
                      ("train", dict(degree=1.0, random_crop=True,
                                     network_process_size=[42, 56]))):
        ds = UnrealStereo4kDataset(
            mode=mode, data_root=str(tmp_path),
            split=str(tmp_path / "split.txt"), transform_cfg=cfg,
            min_depth=1e-3, max_depth=80, resize_mode="depth-anything",
            patch_raw_shape=(42, 56))
        s = ds[0]
        assert s["image_lr"].shape == (42, 56, 3)
        if mode == "infer":
            assert s["image_hr"].shape == (h, w, 3)
            assert s["depth_gt"].shape == (h, w, 1)


def test_loader_propagates_worker_errors():
    """A dataset exception must fail the epoch loudly, not end it early
    (a swallowed loader error once produced a '0 iters' epoch that exited
    0 and saved a checkpoint)."""
    from patchfusion_tpu.data.loader import DataLoader

    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i >= 2:
                raise ValueError("boom")
            return {"x": np.zeros((2, 2), np.float32)}

    loader = DataLoader(Broken(), batch_size=1, num_workers=2)
    with pytest.raises(ValueError, match="boom"):
        for _ in loader:
            pass


def test_onecycle_tiny_total_steps_finite():
    """optax's onecycle schedule yields nan when a phase rounds to zero
    steps; the optimizer must stay finite even for 1-2 step runs."""
    import jax
    import jax.numpy as jnp
    import optax

    from patchfusion_tpu.engine.training import make_onecycle_optimizer

    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.full((3,), 0.1)}
    for ts in (1, 2, 3):
        tx = make_onecycle_optimizer(1e-4, total_steps=ts)
        st = tx.init(params)
        p = params
        for _ in range(3):
            up, st = tx.update(grads, st, p)
            p = optax.apply_updates(p, up)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(p)), ts
