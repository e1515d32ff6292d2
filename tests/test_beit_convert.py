"""BEiT / zoedepth-family checkpoint converter tests.

Covers the torch<->flax mappings for the `patchfusion_zoedepth` family
(reference midas.py:293-345 hook layout, model_io.py:27-96 checkpoints):
activation-level parity of the converted weights against the torch DPT-BEiT
oracle (tests/torch_ref.py:build_midas_beit, the in-repo naming authority),
the full ZoeDepth(BEiT) branch, a bit-exact jax->torch->jax round trip that
loads strict=True on the torch side, the relative-position-bias table
resample (models/beit.py sizes the table for the static trace grid), and the
config-level family dispatch.
"""

import numpy as np
import torch

from patchfusion_tpu.convert import branch_conversion_spec
from patchfusion_tpu.convert.jax2torch import zoedepth_beit_state_dict
from patchfusion_tpu.convert.torch2jax import (midas_dpt_beit_params,
                                               resample_beit_rel_pos_table,
                                               zoedepth_beit_params)
from patchfusion_tpu.models.beit import MidasDPTBEiT
from patchfusion_tpu.models.zoedepth import ZoeDepthBEiT

from . import torch_ref

GRID = (4, 6)
DEPTH = 4
FEAT_KEYS = ["out_conv", "l4_rn", "r4", "r3", "r2", "r1"]
TEMP_KEYS = ["x_d0", "x_blocks_feat_0", "x_blocks_feat_1", "x_blocks_feat_2",
             "x_blocks_feat_3", "midas_final_feat"]
# buffers synthesized (not learned) on export
SYNTH = ("relative_position_index", "k_idx", "K_minus_1")


def test_midas_beit_activation_parity(rng):
    """Converted torch weights reproduce the oracle's rel_depth and all six
    MidasCore hook taps through the flax MidasDPTBEiT."""
    tmodel = torch_ref.build_midas_beit(grid=GRID, depth=DEPTH)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = midas_dpt_beit_params(sd, DEPTH, GRID)

    h, w = 16 * GRID[0], 16 * GRID[1]
    x = rng.random((1, 3, h, w), dtype=np.float32)
    with torch.no_grad():
        gdepth, gfeats = tmodel(torch.from_numpy(x))

    depth, feats = MidasDPTBEiT("BEiT_tiny").apply(
        {"params": params}, np.moveaxis(x, 1, -1))
    np.testing.assert_allclose(np.asarray(depth), gdepth.numpy(),
                               rtol=1e-4, atol=1e-5)
    for k in FEAT_KEYS:
        golden = np.moveaxis(gfeats[k].numpy(), 1, -1)
        np.testing.assert_allclose(np.asarray(feats[k]), golden,
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_zoedepth_beit_parity(rng):
    """Full branch: reference ZoeDepth wrapping the BEiT oracle vs flax
    ZoeDepthBEiT with converted weights — metric depth + the six
    temp_features taps PatchFusion consumes."""
    tmodel = torch_ref.build_zoedepth_beit(grid=GRID, depth=DEPTH)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = zoedepth_beit_params(sd, DEPTH, GRID)

    h, w = 16 * GRID[0], 16 * GRID[1]
    x = rng.random((1, 3, h, w), dtype=np.float32)
    with torch.no_grad():
        gold = tmodel(torch.from_numpy(x), return_final_centers=True)

    out = ZoeDepthBEiT(core_type="BEiT_tiny").apply(
        {"params": params}, np.moveaxis(x, 1, -1))
    np.testing.assert_allclose(np.asarray(out["metric_depth"])[..., 0],
                               gold["metric_depth"].numpy()[:, 0],
                               rtol=1e-3, atol=1e-4)
    for k in TEMP_KEYS:
        golden = np.moveaxis(gold["temp_features"][k].numpy(), 1, -1)
        np.testing.assert_allclose(np.asarray(out["temp_features"][k]),
                                   golden, rtol=1e-3, atol=1e-4, err_msg=k)


def test_zoedepth_beit_roundtrip():
    """torch -> flax -> torch: every learned tensor reconstructed bit-exactly
    in the published MiDaS naming, and the export loads strict=True."""
    tmodel = torch_ref.build_zoedepth_beit(grid=GRID, depth=DEPTH)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = zoedepth_beit_params(sd, DEPTH, GRID)
    back = zoedepth_beit_state_dict(params, DEPTH, GRID)

    ref_keys = {k for k in sd if not any(s in k for s in SYNTH)}
    our_keys = {k for k in back if not any(s in k for s in SYNTH)}
    missing = ref_keys - our_keys
    assert not missing, f"missing keys: {sorted(missing)[:10]}"
    for k in sorted(ref_keys):
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

    tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in back.items()}, strict=True)


def test_rel_pos_table_resample_properties():
    """Layout properties of the table resample: identity on matching grids,
    h-major row ordering (a dh-only table stays dh-only when only the width
    changes), cls rows pass through, constants are preserved."""
    heads = 3
    oh, ow = 2 * 4 - 1, 2 * 4 - 1
    table = np.zeros((oh * ow + 3, heads), np.float32)
    # value depends only on the dh offset (h-major rows: idx = dh*(2w-1)+dw)
    for dh in range(oh):
        table[dh * ow:(dh + 1) * ow] = float(dh)
    table[-3:] = [[7.0] * heads, [8.0] * heads, [9.0] * heads]

    same = resample_beit_rel_pos_table(table, (4, 4), (4, 4))
    np.testing.assert_array_equal(same, table)

    out = resample_beit_rel_pos_table(table, (4, 4), (4, 6))
    nh, nw = 2 * 4 - 1, 2 * 6 - 1
    assert out.shape == (nh * nw + 3, heads)
    np.testing.assert_array_equal(out[-3:], table[-3:])
    # width-only change: each dh band keeps its (constant) value exactly
    band = out[:nh * nw].reshape(nh, nw, heads)
    for dh in range(nh):
        np.testing.assert_allclose(band[dh], float(dh), rtol=0, atol=1e-6)


def test_import_published_grid(rng):
    """The published-checkpoint path: a timm-style state_dict trained at a
    different (square) grid, WITHOUT relative_position_index buffers, imports
    via the square-table inference + bicubic resample and runs at the flax
    model's static grid."""
    tmodel = torch_ref.build_midas_beit(grid=(4, 4), depth=DEPTH, seed=3)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
          if "relative_position_index" not in k}
    params = midas_dpt_beit_params(sd, DEPTH, GRID)

    tbl = params["pretrained"]["blocks_0"]["attn"][
        "relative_position_bias_table"]
    assert tbl.shape[0] == (2 * GRID[0] - 1) * (2 * GRID[1] - 1) + 3

    x = rng.random((1, 16 * GRID[0], 16 * GRID[1], 3), dtype=np.float32)
    depth, _ = MidasDPTBEiT("BEiT_tiny").apply({"params": params}, x)
    assert np.isfinite(np.asarray(depth)).all()


def test_branch_conversion_spec_dispatch():
    """Config-level dispatch: the shipped zoedepth config resolves to the
    midas family at the 384x512 grid; the DA config to the DINOv2 family."""
    family, depth, grid = branch_conversion_spec({
        "coarse_branch": {"type": "ZoeDepth",
                          "midas_model_type": "DPT_BEiT_L_384"},
        "patch_process_shape": (384, 512)})
    assert (family, depth, grid) == ("midas", 24, (24, 32))

    family, depth, grid = branch_conversion_spec({
        "coarse_branch": {"type": "DA-ZoeDepth", "midas_model_type": "vitl"},
        "patch_process_shape": (392, 518)})
    assert (family, depth, grid) == ("da", 24, None)
