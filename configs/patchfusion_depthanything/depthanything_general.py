# Folder-of-images inference with the DA-ViT-L PatchFusion
# (reference configs/patchfusion_depthanything/depthanything_general.py).
_base_ = ["./depthanything_vitl_patchfusion_u4k.py"]

model = dict(config=dict(load_branch=False, pretrain_model=None))
