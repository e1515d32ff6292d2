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


# ---------------------------------------------------------------------------
# MiDaS v3.1 DPT_BEiT torch oracle
# ---------------------------------------------------------------------------
# The reference pulls this model from torch.hub (midas.py:340, repo not
# vendored), so this is an independent torch implementation of the PUBLISHED
# MiDaS v3.1 DPT-BEiT architecture, with state_dict keys in the published
# MiDaS naming (pretrained.model.* / pretrained.act_postprocessN.* /
# scratch.*). It is the activation-level second implementation for
# models/beit.py and the naming authority for convert/{torch2jax,jax2torch}.

def build_midas_beit(embed_dim=64, depth=4, num_heads=4, grid=(4, 6),
                     hooks=(0, 1, 2, 3), features=256,
                     out_channels=(256, 512, 1024, 1024), seed=0):
    """-> torch DPT-BEiT module: forward(x NCHW, H=16*grid[0], W=16*grid[1])
    returns (rel_depth (B,H,W), feats dict with the six MidasCore hook taps).
    Submodule tree mirrors MiDaS: .pretrained.model (timm-style beit),
    .pretrained.act_postprocess1..4, .scratch (hookable refinenets +
    output_conv Sequential whose children()[3] is the hooked ReLU)."""
    import math

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from patchfusion_tpu.models.beit import relative_position_index

    gh, gw = grid
    hd = embed_dim // num_heads

    class BeitAttention(nn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = nn.Linear(embed_dim, 3 * embed_dim, bias=False)
            self.q_bias = nn.Parameter(torch.zeros(embed_dim))
            self.v_bias = nn.Parameter(torch.zeros(embed_dim))
            nrel = (2 * gh - 1) * (2 * gw - 1) + 3
            self.relative_position_bias_table = nn.Parameter(
                torch.zeros(nrel, num_heads))
            self.register_buffer(
                "relative_position_index",
                torch.from_numpy(relative_position_index(gh, gw)).long())
            self.proj = nn.Linear(embed_dim, embed_dim)

        def forward(self, x):
            b, n, c = x.shape
            bias = torch.cat([self.q_bias, torch.zeros_like(self.q_bias),
                              self.v_bias])
            qkv = F.linear(x, self.qkv.weight, bias)
            qkv = qkv.reshape(b, n, 3, num_heads, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q * (hd ** -0.5)) @ k.transpose(-2, -1)
            rel = self.relative_position_bias_table[
                self.relative_position_index.view(-1)].view(n, n, -1)
            attn = attn + rel.permute(2, 0, 1).unsqueeze(0)
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(b, n, c)
            return self.proj(x)

    class Mlp(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(embed_dim, 4 * embed_dim)
            self.fc2 = nn.Linear(4 * embed_dim, embed_dim)

        def forward(self, x):
            return self.fc2(F.gelu(self.fc1(x)))

    class BeitBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(embed_dim, eps=1e-6)
            self.attn = BeitAttention()
            self.gamma_1 = nn.Parameter(1e-5 * torch.ones(embed_dim))
            self.norm2 = nn.LayerNorm(embed_dim, eps=1e-6)
            self.mlp = Mlp()
            self.gamma_2 = nn.Parameter(1e-5 * torch.ones(embed_dim))

        def forward(self, x):
            x = x + self.gamma_1 * self.attn(self.norm1(x))
            return x + self.gamma_2 * self.mlp(self.norm2(x))

    class PatchEmbed(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Conv2d(3, embed_dim, 16, stride=16)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    class BeitModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
            self.patch_embed = PatchEmbed()
            self.blocks = nn.ModuleList([BeitBlock() for _ in range(depth)])

        def forward(self, x):
            t = self.patch_embed(x)
            cls = self.cls_token.expand(t.shape[0], -1, -1)
            t = torch.cat([cls, t], dim=1)
            taps = []
            for i, blk in enumerate(self.blocks):
                t = blk(t)
                if i in set(hooks):
                    taps.append(t)
            return taps

    class ProjectReadout(nn.Module):
        def __init__(self):
            super().__init__()
            self.project = nn.Sequential(
                nn.Linear(2 * embed_dim, embed_dim), nn.GELU())

        def forward(self, x):
            readout = x[:, 0].unsqueeze(1).expand_as(x[:, 1:])
            return self.project(torch.cat((x[:, 1:], readout), -1))

    def act_postprocess(level):
        oc = out_channels[level]
        mods = [ProjectReadout(), nn.Identity(), nn.Identity(),
                nn.Conv2d(embed_dim, oc, 1)]
        if level == 0:
            mods.append(nn.ConvTranspose2d(oc, oc, 4, stride=4))
        elif level == 1:
            mods.append(nn.ConvTranspose2d(oc, oc, 2, stride=2))
        elif level == 3:
            mods.append(nn.Conv2d(oc, oc, 3, stride=2, padding=1))
        return nn.Sequential(*mods)

    class ResidualConvUnit(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(features, features, 3, padding=1)
            self.conv2 = nn.Conv2d(features, features, 3, padding=1)

        def forward(self, x):
            out = self.conv2(F.relu(self.conv1(F.relu(x))))
            return out + x

    class FeatureFusionBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.resConfUnit1 = ResidualConvUnit()
            self.resConfUnit2 = ResidualConvUnit()
            self.out_conv = nn.Conv2d(features, features, 1)

        def forward(self, x, skip=None, size=None):
            if skip is not None:
                x = x + self.resConfUnit1(skip)
            x = self.resConfUnit2(x)
            if size is None:
                size = (x.shape[2] * 2, x.shape[3] * 2)
            x = F.interpolate(x, size=size, mode="bilinear",
                              align_corners=True)
            return self.out_conv(x)

    class Scratch(nn.Module):
        def __init__(self):
            super().__init__()
            for i in range(4):
                setattr(self, f"layer{i + 1}_rn",
                        nn.Conv2d(out_channels[i], features, 3, padding=1,
                                  bias=False))
                setattr(self, f"refinenet{i + 1}", FeatureFusionBlock())
            self.output_conv = nn.Sequential(
                nn.Conv2d(features, features // 2, 3, padding=1),
                nn.Identity(),  # Interpolate(scale 2) applied in forward
                nn.Conv2d(features // 2, 32, 3, padding=1),
                nn.ReLU(True),
                nn.Conv2d(32, 1, 1),
                nn.ReLU(True),
                nn.Identity())

    class Pretrained(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = BeitModel()
            self.act_postprocess1 = act_postprocess(0)
            self.act_postprocess2 = act_postprocess(1)
            self.act_postprocess3 = act_postprocess(2)
            self.act_postprocess4 = act_postprocess(3)

    class DPTBEiT(nn.Module):
        def __init__(self):
            super().__init__()
            self.pretrained = Pretrained()
            self.scratch = Scratch()

        def forward(self, x):
            b, _, h, w = x.shape
            ph, pw = h // 16, w // 16
            taps = self.pretrained.model(x)
            pyr = []
            for lvl, tap in enumerate(taps):
                post = getattr(self.pretrained, f"act_postprocess{lvl + 1}")
                t = post[0](tap)                       # readout
                t = t.transpose(1, 2).reshape(b, embed_dim, ph, pw)
                t = post[3:](t)                        # 1x1 conv (+ resize)
                pyr.append(t)
            sc = self.scratch
            rn = [getattr(sc, f"layer{i + 1}_rn")(pyr[i]) for i in range(4)]
            feats = {"l4_rn": rn[3]}
            p4 = sc.refinenet4(rn[3], size=rn[2].shape[2:])
            feats["r4"] = p4
            p3 = sc.refinenet3(p4, rn[2], size=rn[1].shape[2:])
            feats["r3"] = p3
            p2 = sc.refinenet2(p3, rn[1], size=rn[0].shape[2:])
            feats["r2"] = p2
            p1 = sc.refinenet1(p2, rn[0])
            feats["r1"] = p1
            out = sc.output_conv[0](p1)
            out = F.interpolate(out, scale_factor=2, mode="bilinear",
                                align_corners=True)
            out = sc.output_conv[3](sc.output_conv[2](out))
            feats["out_conv"] = out                    # the hooked ReLU tap
            out = sc.output_conv[5](sc.output_conv[4](out))
            if out.shape[2:] != (h, w):
                out = F.interpolate(out, size=(h, w), mode="bilinear",
                                    align_corners=True)
            return out[:, 0], feats

    torch.manual_seed(seed)
    model = DPTBEiT()
    # non-trivial random weights everywhere (default zeros would hide bugs)
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0, 0.02)
    model.eval()
    return model


def build_zoedepth_beit(grid=(4, 6), seed=0, **beit_kw):
    """Reference ZoeDepth with a MidasCore wrapping the torch BEiT oracle
    (injected directly, bypassing the torch.hub fetch at midas.py:340) —
    the full-branch second implementation for ZoeDepthBEiT."""
    install_stubs()
    add_ref_paths()
    import torch

    midas = build_midas_beit(grid=grid, seed=seed, **beit_kw)

    class _HookableMidas(torch.nn.Module):
        """Adapter exposing the exact hook surface MidasCore.attach_hooks
        expects (midas.py:294-315) while keeping the oracle's state_dict
        naming (pretrained./scratch. prefixes). The oracle drives every
        hooked module (refinenets, layer4_rn, output_conv's ReLU) as a real
        module call, so the reference hooks fire unchanged."""

        def __init__(self, m):
            super().__init__()
            self.pretrained = m.pretrained
            self.scratch = m.scratch
            self._m = [m]  # plain list: hide from state_dict/parameters

        def forward(self, x):
            depth, _feats = self._m[0](x)
            return depth

    from zoedepth.models.base_models.midas import MidasCore
    from zoedepth.models.zoedepth.zoedepth_v1 import ZoeDepth

    torch.manual_seed(seed + 1)
    hm = _HookableMidas(midas)
    core = MidasCore(hm, trainable=False, fetch_features=True,
                     keep_aspect_ratio=False,
                     img_size=[16 * grid[0], 16 * grid[1]], do_resize=False)
    core.output_channels = [256, 256, 256, 256, 256]

    torch.manual_seed(seed + 2)
    model = ZoeDepth(core, n_bins=64, bin_centers_type="softplus",
                     bin_embedding_dim=128, min_depth=1e-3, max_depth=80,
                     n_attractors=[16, 8, 4, 1], attractor_alpha=1000,
                     attractor_gamma=2, attractor_kind="mean",
                     attractor_type="inv", min_temp=0.0212, max_temp=50.0,
                     train_midas=False, midas_lr_factor=10,
                     encoder_lr_factor=10, pos_enc_lr_factor=10)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if not name.startswith("core."):
                p.normal_(0, 0.02)
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
