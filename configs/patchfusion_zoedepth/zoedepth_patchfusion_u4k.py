# PatchFusion with the ZoeDepth (MiDaS DPT_BEiT_L_384) base model
# (reference configs/patchfusion_zoedepth/zoedepth_patchfusion_u4k.py).
# The BEiT core is models/beit.py; weights convert via
# tools/convert_checkpoint.py (family dispatch handles the rel-pos tables).
_base_ = ["../patchfusion_depthanything/depthanything_vitl_patchfusion_u4k.py"]

model = dict(config=dict(
    patch_process_shape=(384, 512),
    pretrain_model=[
        "./work_dir/zoedepth_u4k/coarse_pretrain/checkpoint_24.ckpt",
        "./work_dir/zoedepth_u4k/fine_pretrain/checkpoint_24.ckpt",
    ],
    coarse_branch=dict(type="ZoeDepth", midas_model_type="DPT_BEiT_L_384",
                       img_size=[384, 512]),
    fine_branch=dict(type="ZoeDepth", midas_model_type="DPT_BEiT_L_384",
                     img_size=[384, 512]),
    guided_fusion=dict(
        patch_process_shape=(384, 512),
        in_channels=[32, 256, 256, 256, 256, 256],
        num_patches=[384 * 512, 192 * 256, 96 * 128, 48 * 64,
                     24 * 32, 12 * 16])))

train_dataloader = dict(dataset=dict(
    resize_mode="zoe", transform_cfg=dict(network_process_size=[384, 512])))
val_dataloader = dict(dataset=dict(
    resize_mode="zoe", transform_cfg=dict(network_process_size=[384, 512])))
general_dataloader = dict(dataset=dict(
    network_process_size=(384, 512), resize_mode="zoe"))
