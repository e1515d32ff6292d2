# Demonstration fusion-stage training run on one TPU chip: ViT-L recipe
# shapes (392x518 crops, frozen branches, SILog) against the synthetic
# U4K-format dataset from tools/make_synth_u4k.py. Backs the "actual
# training run" table in BASELINE.md; not a quality recipe.
_base_ = [
    "../patchfusion_depthanything/depthanything_vitl_patchfusion_u4k.py",
]

model = dict(config=dict(
    load_branch=False,        # random branches: no pretrained ckpts offline
    train_remat=True,         # fits batch 2 on one v5e chip (BASELINE.md)
))

train_cfg = dict(max_epochs=4, val_interval=2, save_checkpoint_interval=2,
                 log_interval=8, train_log_img_interval=64,
                 val_log_img_interval=1)

train_dataloader = dict(
    batch_size=2, num_workers=2,
    dataset=dict(data_root="/tmp/u4k_synth",
                 split="/tmp/u4k_synth/train_x16.txt"))
val_dataloader = dict(
    num_workers=1,
    dataset=dict(data_root="/tmp/u4k_synth",
                 split="/tmp/u4k_synth/val.txt"))
