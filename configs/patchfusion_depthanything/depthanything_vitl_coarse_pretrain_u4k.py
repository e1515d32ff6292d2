# Coarse pretraining stage (reference three-stage recipe,
# docs/user_training.md:81-110), Depth-Anything ViT-L.
_base_ = [
    "../_base_/models/da_zoedepth.py",
    "../_base_/datasets/u4k.py",
    "../_base_/run_time.py",
]

min_depth = 1e-3
max_depth = 80

zoe_depth_config = dict(midas_model_type="vitl")

model = dict(
    type="BaselinePretrain",
    min_depth=min_depth,
    max_depth=max_depth,
    target="coarse",
    coarse_branch=dict(_refer_="zoe_depth_config"),
    fine_branch=dict(_refer_="zoe_depth_config"),
    sigloss=dict(type="SILogLoss"))

collect_input_args = ["image_lr", "crops_image_hr", "depth_gt",
                      "crop_depths", "bboxs", "image_hr"]
project = "patchfusion"
train_cfg = dict(max_epochs=24, val_interval=2, save_checkpoint_interval=24,
                 log_interval=100, train_log_img_interval=500,
                 val_log_img_interval=50, val_type="epoch_base",
                 eval_start=0)
optim_wrapper = dict(
    optimizer=dict(type="AdamW", lr=0.0002 / 50, weight_decay=0.01),
    clip_grad=dict(type="norm", max_norm=0.1, norm_type=2))
param_scheduler = dict(cycle_momentum=True, base_momentum=0.85,
                       max_momentum=0.95, div_factor=1,
                       final_div_factor=10000, pct_start=0.5,
                       three_phase=False)
train_dataloader = dict(dataset=dict(
    resize_mode="depth-anything",
    transform_cfg=dict(network_process_size=[392, 518])))
val_dataloader = dict(dataset=dict(
    resize_mode="depth-anything",
    transform_cfg=dict(network_process_size=[392, 518])))
