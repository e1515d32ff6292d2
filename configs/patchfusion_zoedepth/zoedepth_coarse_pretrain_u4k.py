# ZoeDepth (MiDaS-BEiT) coarse pretraining — optional backend, see
# zoedepth_patchfusion_u4k.py.
_base_ = ["../patchfusion_depthanything/depthanything_vitl_coarse_pretrain_u4k.py"]
zoe_depth_config = dict(type="ZoeDepth", midas_model_type="DPT_BEiT_L_384",
                        img_size=[384, 512])
train_dataloader = dict(dataset=dict(
    resize_mode="zoe", transform_cfg=dict(network_process_size=[384, 512])))
val_dataloader = dict(dataset=dict(
    resize_mode="zoe", transform_cfg=dict(network_process_size=[384, 512])))
