"""Helpers to build the reference PyTorch models for parity testing.

The reference (read-only at /root/reference) is imported as-is with its
missing optional deps (mmengine, timm, kornia, xformers) stubbed out — we use
it ONLY to generate golden activations with random weights; no reference code
is vendored into patchfusion_tpu.
"""

import sys
import types

REF = "/root/reference"


def torch_roi_align(feat, boxes, output_size, spatial_scale=1.0,
                    sampling_ratio=-1, aligned=False):
    """Pure-torch port of torchvision.ops.roi_align (torchvision is not in
    this image). Follows the published kernel semantics: aligned offset,
    adaptive sampling grid, bilinear with zero outside [-1, size]."""
    import torch
    n, c, h, w = feat.shape
    if boxes.shape[1] == 5:
        batch_idx = boxes[:, 0].long()
        boxes = boxes[:, 1:]
    else:
        batch_idx = torch.zeros(boxes.shape[0], dtype=torch.long)
    oh, ow = output_size
    off = 0.5 if aligned else 0.0
    outs = []
    for bi in range(boxes.shape[0]):
        x1, y1, x2, y2 = (boxes[bi] * spatial_scale).tolist()
        x1, y1, x2, y2 = x1 - off, y1 - off, x2 - off, y2 - off
        roi_w, roi_h = x2 - x1, y2 - y1
        if not aligned:
            roi_w, roi_h = max(roi_w, 1.0), max(roi_h, 1.0)
        gh = sampling_ratio if sampling_ratio > 0 else int(
            __import__("math").ceil(roi_h / oh))
        gw = sampling_ratio if sampling_ratio > 0 else int(
            __import__("math").ceil(roi_w / ow))
        sy = y1 + (torch.arange(oh * gh, dtype=torch.float64) + 0.5) \
            * roi_h / (oh * gh)
        sx = x1 + (torch.arange(ow * gw, dtype=torch.float64) + 0.5) \
            * roi_w / (ow * gw)

        def axis_w(coords, size):
            valid = (coords >= -1.0) & (coords <= size)
            cc = coords.clamp(0.0, size - 1)
            idx = torch.arange(size, dtype=torch.float64)
            wt = (1 - (cc[:, None] - idx[None, :]).abs()).clamp(min=0)
            return wt * valid[:, None].to(wt)

        wy = axis_w(sy, h).reshape(oh, gh, h).mean(1).float()
        wx = axis_w(sx, w).reshape(ow, gw, w).mean(1).float()
        f = feat[batch_idx[bi]]
        outs.append(torch.einsum("ph,chw,qw->cpq", wy, f, wx))
    return torch.stack(outs, 0)


def _stub(name, **attrs):
    if name in sys.modules:
        m = sys.modules[name]
        for k, v in attrs.items():
            setattr(m, k, v)
        return m
    m = types.ModuleType(name)
    import importlib.machinery
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_stubs():
    import torch
    import torch.nn as nn

    # mmengine: print_log + ConfigDict
    def print_log(msg, logger=None):
        pass

    class ConfigDict(dict):
        def __init__(self, *args, **kwargs):
            super().__init__()
            for k, v in dict(*args, **kwargs).items():
                self[k] = v

        def __setitem__(self, k, v):
            if isinstance(v, dict) and not isinstance(v, ConfigDict):
                v = ConfigDict(v)
            super().__setitem__(k, v)

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

        def __setattr__(self, k, v):
            self[k] = v

        def to_dict(self):
            return self

    mm = _stub("mmengine", print_log=print_log, ConfigDict=ConfigDict)
    _stub("mmengine.config", ConfigDict=ConfigDict)
    mm.config = sys.modules["mmengine.config"]

    # timm.models.layers: DropPath, to_2tuple, trunc_normal_
    class DropPath(nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(t, std=1.0, **kw):
        with torch.no_grad():
            t.normal_(0, std).clamp_(-2 * std, 2 * std)
        return t

    timm = _stub("timm")
    _stub("timm.models")
    tml = _stub("timm.models.layers", DropPath=DropPath, to_2tuple=to_2tuple,
                trunc_normal_=trunc_normal_)
    timm.models = sys.modules["timm.models"]
    sys.modules["timm.models"].layers = tml

    # torchvision.transforms.Normalize (used by PrepForMidas / depth_model)
    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(1, -1, 1, 1)
            self.std = torch.tensor(std).view(1, -1, 1, 1)

        def __call__(self, x):
            return (x - self.mean.to(x)) / self.std.to(x)

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    class ToTensor:
        def __call__(self, x):
            import numpy as _np
            return torch.from_numpy(_np.array(x)).permute(2, 0, 1) / 255.0

    tv = _stub("torchvision")
    tvt = _stub("torchvision.transforms", Normalize=Normalize,
                Compose=Compose, ToTensor=ToTensor)
    tv.transforms = tvt

    tvo = _stub("torchvision.ops", roi_align=torch_roi_align)
    tv.ops = tvo

    # kornia (imported at top of reference losses.py; unused by SILog path)
    kor = _stub("kornia")
    klo = _stub("kornia.losses", dice_loss=None, focal_loss=None)
    kfi = _stub("kornia.filters", spatial_gradient=None)
    kor.losses = klo
    kor.filters = kfi


def _load_module(name, path):
    import importlib.util
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def build_guided_fusion(**kwargs):
    """Reference GuidedFusionPatchFusion, loaded file-directly to avoid the
    estimator package __init__ chain (which imports cv2/kornia/etc.)."""
    install_stubs()
    import torch

    class _Reg:
        def register_module(self, cls=None, **kw):
            if cls is not None:
                return cls
            return lambda c: c

    for name in ["estimator", "estimator.models", "estimator.models.blocks"]:
        _stub(name)
    _stub("estimator.registry", MODELS=_Reg(), DATASETS=_Reg())
    _load_module("estimator.models.blocks.swin_layers",
                 REF + "/estimator/models/blocks/swin_layers.py")
    gf = _load_module("estimator.models.blocks.guided_fusion_model",
                      REF + "/estimator/models/blocks/guided_fusion_model.py")
    torch.manual_seed(0)
    model = gf.GuidedFusionPatchFusion(**kwargs)
    model.eval()
    return model


def build_patchfusion_ref(config: dict):
    """Full reference PatchFusion (patchfusion.py:56-174) with random
    weights, loaded file-directly with stubbed deps."""
    install_stubs()
    add_ref_paths()
    import os
    import torch

    class _Reg:
        def register_module(self, cls=None, **kw):
            if cls is not None:
                return cls
            return lambda c: c

    for name in ["estimator", "estimator.models", "estimator.models.blocks"]:
        _stub(name)
    _stub("estimator.registry", MODELS=_Reg(), DATASETS=_Reg())
    _load_module("estimator.models.utils",
                 REF + "/estimator/models/utils.py")
    losses = _load_module("estimator.models.losses",
                          REF + "/estimator/models/losses.py")
    _load_module("estimator.models.blocks.swin_layers",
                 REF + "/estimator/models/blocks/swin_layers.py")
    gf = _load_module("estimator.models.blocks.guided_fusion_model",
                      REF + "/estimator/models/blocks/guided_fusion_model.py")

    def build_model(cfg, **extra):
        cfg = dict(cfg)
        t = cfg.pop("type")
        table = {"SILogLoss": losses.SILogLoss,
                 "GuidedFusionPatchFusion": gf.GuidedFusionPatchFusion}
        return table[t](**cfg, **extra)

    sys.modules["estimator.models"].build_model = build_model
    bp = _load_module("estimator.models.baseline_pretrain",
                      REF + "/estimator/models/baseline_pretrain.py")
    sys.modules["estimator.models"].baseline_pretrain = bp
    pf = _load_module("estimator.models.patchfusion",
                      REF + "/estimator/models/patchfusion.py")

    torch.manual_seed(0)
    cwd = os.getcwd()
    os.chdir(REF)
    try:
        # plain dict -> the from-hub path (load_branch=False, no ckpt IO)
        model = pf.PatchFusion(dict(config))
    finally:
        os.chdir(cwd)
    model.eval()
    return model


def build_baseline_pretrain_ref(zoe_cfg: dict, target: str,
                                image_raw_shape, patch_split_num,
                                patch_process_shape):
    """Reference BaselinePretrain (baseline_pretrain.py:44-419) with random
    weights, loaded file-directly."""
    install_stubs()
    add_ref_paths()
    import os
    import torch

    class _Reg:
        def register_module(self, cls=None, **kw):
            if cls is not None:
                return cls
            return lambda c: c

    for name in ["estimator", "estimator.models"]:
        _stub(name)
    _stub("estimator.registry", MODELS=_Reg(), DATASETS=_Reg())
    _load_module("estimator.models.utils",
                 REF + "/estimator/models/utils.py")
    losses = _load_module("estimator.models.losses",
                          REF + "/estimator/models/losses.py")

    def build_model(cfg, **extra):
        cfg = dict(cfg)
        t = cfg.pop("type")
        return {"SILogLoss": losses.SILogLoss}[t](**cfg, **extra)

    sys.modules["estimator.models"].build_model = build_model
    bp = _load_module("estimator.models.baseline_pretrain",
                      REF + "/estimator/models/baseline_pretrain.py")
    from mmengine import ConfigDict
    torch.manual_seed(0)
    cwd = os.getcwd()
    os.chdir(REF)
    try:
        model = bp.BaselinePretrain(
            coarse_branch=ConfigDict(zoe_cfg),
            fine_branch=ConfigDict(zoe_cfg),
            sigloss=dict(type="SILogLoss"),
            min_depth=zoe_cfg["min_depth"], max_depth=zoe_cfg["max_depth"],
            image_raw_shape=image_raw_shape,
            patch_process_shape=patch_process_shape,
            patch_split_num=patch_split_num,
            target=target)
    finally:
        os.chdir(cwd)
    model.eval()
    return model


def add_ref_paths():
    for p in [REF, REF + "/external",
              REF + "/external/torchhub/facebookresearch_dinov2_main"]:
        if p not in sys.path:
            sys.path.insert(0, p)


def build_dinov2(core_type="vits", seed=0):
    """Reference DinoVisionTransformer with random weights."""
    install_stubs()
    add_ref_paths()
    import torch
    import vision_transformer as vt  # torchhub root module
    fns = {"vits": vt.vit_small, "vitb": vt.vit_base, "vitl": vt.vit_large}
    torch.manual_seed(seed)
    model = fns[core_type](patch_size=14, img_size=518, init_values=1.0,
                           block_chunks=0)
    model.eval()
    return model


def build_dpt_dinov2(core_type="vits", seed=0):
    """Reference DPT_DINOv2 (Depth-Anything decoder on DINOv2).

    The reference loads DINOv2 via a CWD-relative torch.hub path
    (dpt.py:140), so we chdir into the reference tree for construction.
    """
    install_stubs()
    add_ref_paths()
    import os
    import torch
    torch.manual_seed(seed)
    from depth_anything.dpt import DPT_DINOv2
    feats = {"vits": 64, "vitb": 128, "vitl": 256}[core_type]
    oc = {"vits": [48, 96, 192, 384], "vitb": [96, 192, 384, 768],
          "vitl": [256, 512, 1024, 1024]}[core_type]
    cwd = os.getcwd()
    os.chdir(REF)
    try:
        model = DPT_DINOv2(encoder=core_type, features=feats,
                           out_channels=oc, use_clstoken=False)
    finally:
        os.chdir(cwd)
    model.eval()
    return model


ZOE_TEST_KW = dict(
    n_bins=64, bin_centers_type="softplus", bin_embedding_dim=128,
    min_depth=1e-3, max_depth=80, n_attractors=[16, 8, 4, 1],
    attractor_alpha=1000, attractor_gamma=2, attractor_kind="mean",
    attractor_type="inv", min_temp=0.0212, max_temp=50.0,
    midas_model_type="vits", img_size=[392, 518], do_resize=False,
    use_pretrained_midas=False, train_midas=False, freeze_midas_bn=True,
    depth_anything=True, force_keep_ar=True, pretrained_resource=None)


def build_zoedepth(core_type="vits", seed=0):
    """Reference ZoeDepth (DA core) with random weights, canonical config
    (configs/patchfusion_depthanything/depthanything_vitl_patchfusion_u4k.py
    zoe_depth_config, with midas_model_type swapped)."""
    install_stubs()
    add_ref_paths()
    import os
    import torch
    torch.manual_seed(seed)
    from zoedepth.models.zoedepth.zoedepth_v1 import ZoeDepth
    kw = dict(ZOE_TEST_KW)
    kw["midas_model_type"] = core_type
    cwd = os.getcwd()
    os.chdir(REF)  # DPT_DINOv2 loads dinov2 via a CWD-relative hub path
    try:
        model = ZoeDepth.build(**kw)
    finally:
        os.chdir(cwd)
    model.eval()
    return model


def load_ref_losses():
    """Reference estimator/models/losses.py module (for loss parity tests),
    loaded file-directly with stubbed deps."""
    install_stubs()

    class _Reg:
        def register_module(self, cls=None, **kw):
            if cls is not None:
                return cls
            return lambda c: c

    for name in ["estimator", "estimator.models"]:
        _stub(name)
    _stub("estimator.registry", MODELS=_Reg(), DATASETS=_Reg())
    return _load_module("estimator.models.losses",
                        REF + "/estimator/models/losses.py")
