"""Export trained patchfusion_tpu weights in the reference's HuggingFace
snapshot layout (tools/convert_huggingface.py analogue, in reverse): writes
config.json + pytorch_model.bin containing the FULL reference-layout
state_dict, loadable by the reference's `PatchFusion.from_pretrained` or by
our `PatchFusion.from_pretrained`."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--weights", required=True,
                   help="native .msgpack weights (tools/convert_checkpoint "
                        "or trainer output)")
    p.add_argument("--out-dir", required=True)
    args = p.parse_args()

    import torch

    from patchfusion_tpu.config import Config
    from patchfusion_tpu.convert import branch_conversion_spec
    from patchfusion_tpu.convert.jax2torch import patchfusion_state_dict
    from patchfusion_tpu.engine.checkpoint import load_params

    cfg = Config.fromfile(args.config)
    mc = cfg.model["config"].to_dict() if hasattr(
        cfg.model["config"], "to_dict") else dict(cfg.model["config"])
    blob = load_params(args.weights)
    params = blob["params"]
    stats = blob.get("batch_stats", {})
    family, vit_depth, grid = branch_conversion_spec(mc)
    fusion_depths = tuple(mc["guided_fusion"].get("depth",
                                                  (2, 2, 3, 3, 4, 4)))
    fusion_only = "coarse_branch" not in params

    sd = patchfusion_state_dict(params, stats, vit_depth, fusion_depths,
                                fusion_only=fusion_only,
                                family=family, grid=grid)
    os.makedirs(args.out_dir, exist_ok=True)
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
               os.path.join(args.out_dir, "pytorch_model.bin"))
    with open(os.path.join(args.out_dir, "config.json"), "w") as f:
        json.dump({"config": mc}, f, indent=2, default=str)
    print(f"exported {len(sd)} tensors to {args.out_dir} "
          f"(fusion_only={fusion_only})")


if __name__ == "__main__":
    main()
