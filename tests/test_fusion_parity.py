"""Parity: flax GuidedFusion (+ hoisted G2L/ROI) vs the reference
GuidedFusionPatchFusion with identical random weights.

The TPU build restructures the computation — G2L attention runs once on the
whole-image coarse features and ROI-align gathers per-tile views — so this
test validates that the restructured pipeline is numerically identical to
the reference's per-call G2L + repeated-feature roi_align."""

import numpy as np
import torch

from patchfusion_tpu.convert.torch2jax import guided_fusion_params
from patchfusion_tpu.models.fusion import GuidedFusion
from patchfusion_tpu.ops import roi_align_single

from . import torch_ref

SIZES = [(5, 7), (10, 13), (20, 26), (40, 52), (80, 104), (140, 182)]
COARSE_CH = [64, 64, 64, 64, 64, 32]
GUIDE_CH = [64, 64, 64, 64, 64, 32]
DEPTHS = [2, 2, 3, 3, 4, 4]
PROC = (140, 182)


def test_guided_fusion_parity(rng):
    kwargs = dict(n_channels=5, g2l=True,
                  in_channels=[32, 64, 64, 64, 64, 64],
                  depth=DEPTHS, num_heads=[8, 8, 16, 16, 32, 32],
                  num_patches=[h * w for (h, w) in SIZES[::-1]],
                  patch_process_shape=list(PROC))
    tmodel = torch_ref.build_guided_fusion(**kwargs)
    params, stats = guided_fusion_params(tmodel.state_dict(), DEPTHS)

    n_tiles = 2
    coarse_whole = [rng.standard_normal((1, c, h, w), dtype=np.float32)
                    for c, (h, w) in zip(COARSE_CH, SIZES)]
    guide_cat = [rng.standard_normal((n_tiles, c, h, w), dtype=np.float32)
                 for c, (h, w) in zip(GUIDE_CH, SIZES)]
    inp = rng.standard_normal((n_tiles, 5, *PROC), dtype=np.float32)
    boxes = np.array([[0.0, 0.0, 91.0, 70.0],
                      [35.0, 28.0, 126.0, 98.0]], np.float32)
    boxes5 = np.concatenate([np.zeros((n_tiles, 1), np.float32), boxes], 1)

    with torch.no_grad():
        golden = tmodel(
            input_tensor=torch.from_numpy(inp),
            guide_plus=None,
            guide_cat=[torch.from_numpy(g) for g in guide_cat],
            bbox=torch.from_numpy(boxes5),
            fine_feat_crop=None,
            coarse_feat_whole=[torch.from_numpy(c) for c in coarse_whole],
            coarse_feat_whole_hack=None,
            coarse_feat_crop=None)
    golden = golden[::-1]  # reference returns high->low; compare low->high

    model = GuidedFusion(n_channels=5,
                         in_channels=(32, 64, 64, 64, 64, 64),
                         depth=tuple(DEPTHS),
                         num_heads=(8, 8, 16, 16, 32, 32),
                         num_patches=tuple(h * w for h, w in SIZES[::-1]))
    variables = {"params": params, "batch_stats": stats}
    cw_nhwc = [np.moveaxis(c, 1, -1) for c in coarse_whole]
    attended = model.apply(variables, cw_nhwc,
                           method=GuidedFusion.attend_coarse)
    g2l_roi = [
        np.asarray(roi_align_single(a[0], boxes, h, w, h / PROC[0],
                                    sampling_ratio=1))
        for a, (h, w) in zip(attended, SIZES)]
    outs = model.apply(variables, np.moveaxis(inp, 1, -1),
                       [np.moveaxis(g, 1, -1) for g in guide_cat], g2l_roi)

    assert len(outs) == 6
    for i, (o, g) in enumerate(zip(outs, golden)):
        np.testing.assert_allclose(np.asarray(o),
                                   np.moveaxis(g.numpy(), 1, -1),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=f"level {i}")
