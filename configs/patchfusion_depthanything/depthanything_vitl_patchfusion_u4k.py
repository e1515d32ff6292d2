# PatchFusion fusion-stage training/inference, Depth-Anything ViT-L
# (capability-equivalent to the reference config of the same name).
_base_ = [
    "../_base_/models/da_zoedepth.py",
    "../_base_/datasets/u4k.py",
    "../_base_/datasets/general_dataset.py",
    "../_base_/run_time.py",
]

min_depth = 1e-3
max_depth = 80

model = dict(
    type="PatchFusion",
    config=dict(
        image_raw_shape=(2160, 3840),
        patch_split_num=(4, 4),
        patch_process_shape=(392, 518),
        min_depth=min_depth,
        max_depth=max_depth,
        load_branch=True,
        pretrain_model=[
            "./work_dir/depthanything_vitl_u4k/coarse_pretrain/checkpoint_24.ckpt",
            "./work_dir/depthanything_vitl_u4k/fine_pretrain/checkpoint_24.ckpt",
        ],
        coarse_branch=dict(_refer_="zoe_depth_config"),
        fine_branch=dict(_refer_="zoe_depth_config"),
        guided_fusion=dict(
            type="GuidedFusionPatchFusion",
            patch_process_shape=(392, 518),
            in_channels=[32, 256, 256, 256, 256, 256],
            num_patches=[392 * 518, 224 * 296, 112 * 148, 56 * 74,
                         28 * 37, 14 * 19],
            n_channels=5,
            g2l=True),
        sigloss=dict(type="SILogLoss")))

collect_input_args = ["image_lr", "crops_image_hr", "depth_gt",
                      "crop_depths", "bboxs", "image_hr"]

project = "patchfusion"

train_cfg = dict(max_epochs=16, val_interval=2, save_checkpoint_interval=16,
                 log_interval=100, train_log_img_interval=500,
                 val_log_img_interval=50, val_type="epoch_base",
                 eval_start=0)

optim_wrapper = dict(
    optimizer=dict(type="AdamW", lr=0.0001, weight_decay=0.001),
    clip_grad=dict(type="norm", max_norm=0.1, norm_type=2))

param_scheduler = dict(
    cycle_momentum=True,
    base_momentum=0.85,
    max_momentum=0.95,
    div_factor=10,
    final_div_factor=10000,
    pct_start=0.25,
    three_phase=False)

convert_syncbn = True  # SyncBN is implicit under GSPMD data parallelism

train_dataloader = dict(dataset=dict(
    resize_mode="depth-anything",
    transform_cfg=dict(network_process_size=[392, 518])))
val_dataloader = dict(dataset=dict(
    resize_mode="depth-anything",
    transform_cfg=dict(network_process_size=[392, 518])))
test_in_dataloader = dict(dataset=dict(
    resize_mode="depth-anything",
    transform_cfg=dict(network_process_size=[392, 518])))
test_out_dataloader = dict(dataset=dict(
    resize_mode="depth-anything",
    transform_cfg=dict(network_process_size=[392, 518])))
general_dataloader = dict(dataset=dict(
    network_process_size=(392, 518), resize_mode="depth-anything"))
