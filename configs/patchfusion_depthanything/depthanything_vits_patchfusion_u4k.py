# PatchFusion fusion stage, Depth-Anything ViT-S (deltas over vitl base).
_base_ = ["./depthanything_vitl_patchfusion_u4k.py"]

model = dict(config=dict(
    pretrain_model=[
        "./work_dir/depthanything_vits_u4k/coarse_pretrain/checkpoint_24.ckpt",
        "./work_dir/depthanything_vits_u4k/fine_pretrain/checkpoint_24.ckpt",
    ],
    coarse_branch=dict(midas_model_type="vits"),
    fine_branch=dict(midas_model_type="vits"),
    guided_fusion=dict(in_channels=[32, 64, 64, 64, 64, 64])))
