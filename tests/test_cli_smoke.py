"""CLI end-to-end smoke: tools/infer.py on every bundled example image
(the README-quickstart path, reference tools/test_single_forward.py) at a
reduced raw shape with random weights — asserts finite output and both PNG
artifacts. VERDICT r1 item 8.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(REPO, "examples"))
    if f.endswith(".jpeg"))

TOY_CFG = """
min_depth = 1e-3
max_depth = 80
_zoe = dict(type="DA-ZoeDepth", midas_model_type="vitmicro",
            img_size=[42, 56], n_bins=64, bin_centers_type="softplus",
            bin_embedding_dim=128, n_attractors=[16, 8, 4, 1],
            attractor_alpha=1000, attractor_gamma=2, attractor_kind="mean",
            attractor_type="inv", min_temp=0.0212, max_temp=50.0)
_sizes = [(2, 2), (3, 4), (6, 8), (12, 16), (24, 32), (42, 56)]
model = dict(type="PatchFusion", config=dict(
    image_raw_shape=(84, 112), patch_split_num=(2, 2),
    patch_process_shape=(42, 56), min_depth=min_depth, max_depth=max_depth,
    load_branch=False, pretrain_model=None,
    coarse_branch=_zoe, fine_branch=_zoe,
    guided_fusion=dict(type="GuidedFusionPatchFusion",
                       patch_process_shape=(42, 56),
                       in_channels=[32, 32, 32, 32, 32, 32],
                       depth=[1, 1, 1, 1, 1, 1],
                       num_heads=[2, 2, 2, 2, 2, 2],
                       num_patches=[h * w for (h, w) in _sizes[::-1]],
                       n_channels=5, g2l=True),
    sigloss=dict(type="SILogLoss")))
"""


def test_examples_bundled():
    """The reference ships 4 example JPEGs (examples/example_{1..4}.jpeg)."""
    assert EXAMPLES == [f"example_{i}.jpeg" for i in (1, 2, 3, 4)]


def test_infer_cli_all_examples(tmp_path):
    cfg = tmp_path / "toy_cfg.py"
    cfg.write_text(TOY_CFG)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    for i, name in enumerate(EXAMPLES):
        out = tmp_path / f"depth_{i}.png"
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "infer.py"),
             os.path.join(REPO, "examples", name),
             "--config", str(cfg), "--cai-mode", "m1",
             "--process-num", "2", "--image-raw-shape", "84", "112",
             "--out", str(out)],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=560)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "depth:" in r.stdout
        assert out.exists()
        assert (tmp_path / f"depth_{i}_uint16.png").exists()
        from PIL import Image
        d16 = np.asarray(Image.open(tmp_path / f"depth_{i}_uint16.png"))
        assert d16.dtype == np.uint16 and d16.shape == (84, 112)
        assert np.isfinite(d16).all() and d16.max() > 0
