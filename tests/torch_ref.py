"""Helpers to build the reference PyTorch models for parity testing.

The reference (read-only at /root/reference) is imported as-is with its
missing optional deps (mmengine, timm, kornia, xformers) stubbed out — we use
it ONLY to generate golden activations with random weights; no reference code
is vendored into patchfusion_tpu.
"""

import sys
import types

REF = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
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
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

        def to_dict(self):
            return dict(self)

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
