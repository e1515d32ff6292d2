"""torch -> flax -> torch checkpoint round trip: every reference key is
reconstructed bit-exactly (the dead embed_proj and index buffers are
synthesized; values compared only for real weights)."""

import numpy as np

from patchfusion_tpu.convert import jax2torch, torch2jax

from . import torch_ref
from .test_patchfusion_e2e import make_config

SYNTH = ("embed_proj", "relative_position_index", "num_batches_tracked",
         "mask_token", "k_idx", "K_minus_1")


def test_patchfusion_roundtrip():
    config = make_config()
    tmodel = torch_ref.build_patchfusion_ref(config)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    params, stats = torch2jax.patchfusion_params(sd, vit_depth=12)
    back = jax2torch.patchfusion_state_dict(params, stats["fusion"] and
                                            stats, 12, fusion_only=False)

    ref_keys = {k for k in sd if not any(s in k for s in SYNTH)}
    our_keys = {k for k in back if not any(s in k for s in SYNTH)}
    missing = ref_keys - our_keys
    assert not missing, f"missing keys: {sorted(missing)[:10]}"

    for k in sorted(ref_keys):
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

    # synthesized keys exist so the export loads strict=True
    assert "guided_fusion.g2l_list.0.embed_proj.weight" in back
