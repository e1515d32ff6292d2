# Folder inference with the ZoeDepth-based PatchFusion (optional backend).
_base_ = ["./zoedepth_patchfusion_u4k.py"]
model = dict(config=dict(load_branch=False, pretrain_model=None))
