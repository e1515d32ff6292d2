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
