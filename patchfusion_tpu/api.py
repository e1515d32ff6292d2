"""User-facing PatchFusion API.

Mirrors the reference's public surface (README:63-75,
tools/test_single_forward.py): build from a config or a pretrained
checkpoint directory, then call tiled inference. A reference user writes

    model = PatchFusion.from_pretrained('Zhyever/patchfusion_...')
    depth, _ = model(mode='infer', cai_mode='r128', process_num=4,
                     image_lr=lr, image_hr=hr)

and here:

    model = PatchFusion.from_pretrained('<local snapshot dir>')   # or
    model = PatchFusion.from_config(cfg_dict, ckpts=(coarse, fine, fusion))
    depth = model.infer(image_lr, image_hr, cai_mode='r128', process_num=4)

(`model.resizer` and `model.tile_cfg` are provided like the reference's.)
Zero-egress note: from_pretrained takes a LOCAL directory in the HF snapshot
layout (config.json + pytorch_model.bin/safetensors); hub download is
attempted only if huggingface_hub can reach the network.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from patchfusion_tpu.engine.inference import PatchFusionInference
from patchfusion_tpu.models.builder import build_patchfusion
from patchfusion_tpu.models.patchfusion import TileConfig
from patchfusion_tpu.ops.resize import NetResizer


class PatchFusion:
    def __init__(self, net, tile_cfg: TileConfig, variables: Dict[str, Any],
                 config: Dict[str, Any], process_num: int = 4):
        self.net = net
        self.tile_cfg = tile_cfg
        self.variables = variables
        self.config = config
        multiple = 14 if config["coarse_branch"].get(
            "type", "DA-ZoeDepth") == "DA-ZoeDepth" else 32
        pph, ppw = tile_cfg.patch_process_shape
        self.resizer = NetResizer(ppw, pph, keep_aspect_ratio=False,
                                  ensure_multiple_of=multiple,
                                  resize_method="minimal")
        self._engines: Dict[int, PatchFusionInference] = {}
        self.default_process_num = process_num

    # -- constructors ---------------------------------------------------------

    @classmethod
    def from_config(cls, config: Dict[str, Any],
                    ckpts: Optional[Tuple[str, str, Optional[str]]] = None,
                    dtype=jnp.float32, seed: int = 0,
                    cast_params: bool = True) -> "PatchFusion":
        """config: the reference model.config dict. ckpts: optional
        (coarse.pth, fine.pth, fusion.pth) reference checkpoints.
        cast_params: with dtype=bf16, also STORE weights in bf16 (the
        modules compute in bf16 regardless; f32 master copies of the frozen
        branches waste ~1.5 GB HBM for vitl inference)."""
        net, tile_cfg = build_patchfusion(config, dtype=dtype)
        if ckpts is not None:
            from patchfusion_tpu.convert import branch_conversion_spec
            from patchfusion_tpu.engine.checkpoint import \
                load_patchfusion_from_torch
            family, depth, grid = branch_conversion_spec(config)
            fusion_depths = tuple(config["guided_fusion"].get(
                "depth", (2, 2, 3, 3, 4, 4)))
            params, stats = load_patchfusion_from_torch(
                ckpts[0], ckpts[1], ckpts[2], depth, fusion_depths,
                family=family, grid=grid)
            missing = _init_missing(net, tile_cfg, params, stats, seed)
            variables = missing
        else:
            variables = _init_variables(net, tile_cfg, seed)
        if dtype == jnp.bfloat16 and cast_params:
            variables = dict(variables)
            variables["params"] = _cast_tree_bf16(variables["params"])
        return cls(net, tile_cfg, variables, config)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.float32) -> "PatchFusion":
        """Load a HF-layout snapshot directory: config.json (the reference
        convert_huggingface.py export) + pytorch_model.bin/safetensors."""
        if not os.path.isdir(path):
            from huggingface_hub import snapshot_download
            path = snapshot_download(path)
        with open(os.path.join(path, "config.json")) as f:
            raw = json.load(f)
        config = _normalize_hub_config(raw)
        net, tile_cfg = build_patchfusion(config, dtype=dtype)
        from patchfusion_tpu.convert import branch_conversion_spec
        from patchfusion_tpu.engine.checkpoint import \
            load_patchfusion_hub_dir
        family, depth, grid = branch_conversion_spec(config)
        fusion_depths = tuple(config["guided_fusion"].get(
            "depth", (2, 2, 3, 3, 4, 4)))
        params, stats = load_patchfusion_hub_dir(path, depth, fusion_depths,
                                                 family=family, grid=grid)
        variables = {"params": params, "batch_stats": stats}
        return cls(net, tile_cfg, variables, config)

    # -- persistence (reference load_dict/get_save_dict semantics) -----------

    def get_save_dict(self):
        """Fusion-only weight tree (the reference strips the frozen
        branches, patchfusion.py:179-187)."""
        params = {k: v for k, v in self.variables["params"].items()
                  if k not in ("coarse_branch", "fine_branch")}
        return {"params": params,
                "batch_stats": self.variables.get("batch_stats", {})}

    def save(self, path: str) -> None:
        from patchfusion_tpu.engine.checkpoint import save_params
        d = self.get_save_dict()
        save_params(path, d["params"], d["batch_stats"])

    def load_dict(self, path: str) -> None:
        """Merge a fusion-only weights file over current variables
        (strict=False semantics)."""
        from patchfusion_tpu.engine.checkpoint import load_params
        blob = load_params(path)
        self.variables["params"].update(blob["params"])
        if blob.get("batch_stats"):
            self.variables.setdefault("batch_stats", {}).update(
                blob["batch_stats"])
        self._engines.clear()

    # -- inference -------------------------------------------------------------

    def engine(self, process_num: Optional[int] = None,
               tile_cfg: Optional[TileConfig] = None,
               mesh=None, chunk_policy: str = "greedy"
               ) -> PatchFusionInference:
        """mesh: optional jax.sharding.Mesh with a 'patch' axis — shards the
        tile batch over ICI (parallel/mesh.py::make_patch_mesh).
        chunk_policy: "greedy" (fastest) or "divisor" (single compiled
        chunk body — ~2/3 the cold-compile time, see _chunked)."""
        pn = process_num or self.default_process_num
        tc = tile_cfg or self.tile_cfg
        key = (pn, tc.image_raw_shape, tc.patch_split_num, mesh,
               chunk_policy)
        if key not in self._engines:
            self._engines[key] = PatchFusionInference(
                self.net, self.variables, tc, process_num=pn, mesh=mesh,
                chunk_policy=chunk_policy)
        return self._engines[key]

    def infer(self, image_lr: np.ndarray, image_hr: np.ndarray,
              cai_mode: str = "m1", process_num: Optional[int] = None,
              image_raw_shape=None, patch_split_num=None,
              rng: Optional[np.random.Generator] = None,
              mesh=None, chunk_policy: str = "greedy") -> np.ndarray:
        """image_lr (1,h,w,3) NHWC in [0,1]; image_hr (H,W,3). Returns
        depth (H', W') numpy."""
        tc = self.tile_cfg
        if image_raw_shape is not None or patch_split_num is not None:
            tc = TileConfig(
                tuple(image_raw_shape or tc.image_raw_shape),
                tuple(patch_split_num or tc.patch_split_num),
                tc.patch_process_shape)
        eng = self.engine(process_num, tc, mesh=mesh,
                          chunk_policy=chunk_policy)
        return np.asarray(eng.infer(image_lr, image_hr, cai_mode=cai_mode,
                                    rng=rng))

    def __call__(self, mode: str = "infer", image_lr=None, image_hr=None,
                 cai_mode: str = "m1", process_num: int = 4, tile_cfg=None,
                 **kwargs):
        """Reference-signature compatibility shim
        (patchfusion.py:359-453): returns (depth (1,1,H,W), log dict)."""
        assert mode == "infer", "use engine/training for the train path"
        lr = _to_nhwc(image_lr)
        hr = _to_nhwc(image_hr)[0]
        kw = {}
        if tile_cfg is not None:
            kw = dict(image_raw_shape=tile_cfg.get("image_raw_shape"),
                      patch_split_num=tile_cfg.get("patch_split_num"))
        depth = self.infer(lr, hr, cai_mode=cai_mode,
                           process_num=process_num, **kw)
        return depth[None, None], {"rgb": image_lr,
                                   "depth_pred": depth[None, None]}


class BaselinePretrain:
    """Coarse-only / fine-only model API (reference estimator/models/
    baseline_pretrain.py BaselinePretrain, target='coarse'|'fine'): stage-1/2
    of the training recipe and their eval paths.

    coarse: one whole-image pass at process resolution;
    fine:   the full tiling machinery with fusion disabled
            (reference bp:364-419)."""

    def __init__(self, branch_cfg: Dict[str, Any], min_depth: float,
                 max_depth: float, target: str = "coarse",
                 image_raw_shape=(2160, 3840), patch_split_num=(4, 4),
                 patch_process_shape=(384, 512), dtype=jnp.float32,
                 seed: int = 0, params=None, mesh=None):
        from patchfusion_tpu.models.builder import build_zoedepth_branch
        import jax

        self.target = target
        self.net = build_zoedepth_branch(branch_cfg, min_depth, max_depth,
                                         dtype=dtype)
        self.tile_cfg = TileConfig(tuple(image_raw_shape),
                                   tuple(patch_split_num),
                                   tuple(patch_process_shape))
        pph, ppw = patch_process_shape
        if params is None:
            params = self.net.init(jax.random.PRNGKey(seed),
                                   jnp.zeros((1, pph, ppw, 3)))["params"]
        self.params = params
        multiple = 14 if branch_cfg.get("type",
                                        "DA-ZoeDepth") == "DA-ZoeDepth" \
            else 32
        self.resizer = NetResizer(ppw, pph, keep_aspect_ratio=False,
                                  ensure_multiple_of=multiple,
                                  resize_method="minimal")
        self.mesh = mesh
        self._coarse_fn = None
        self._fine_engine = None

    @classmethod
    def from_torch(cls, branch_cfg, min_depth, max_depth, ckpt_path: str,
                   **kw):
        """Load a reference branch checkpoint (.pth, strict — reference
        baseline_pretrain.py:121-127 load_dict)."""
        from patchfusion_tpu.convert import branch_conversion_spec
        from patchfusion_tpu.convert.torch2jax import branch_params
        from patchfusion_tpu.engine.checkpoint import load_torch_state_dict
        sd = load_torch_state_dict(ckpt_path)
        family, depth, grid = branch_conversion_spec({
            "coarse_branch": branch_cfg,
            "patch_process_shape": kw.get("patch_process_shape",
                                          (384, 512))})
        params = branch_params(sd, depth, family=family, grid=grid)
        return cls(branch_cfg, min_depth, max_depth, params=params, **kw)

    def infer(self, image_lr=None, image_hr=None, cai_mode: str = "m1",
              process_num: int = 4,
              rng: Optional[np.random.Generator] = None,
              **_ignored) -> np.ndarray:
        import jax

        if self.target == "coarse":
            if self._coarse_fn is None:
                net = self.net
                self._coarse_fn = jax.jit(
                    lambda p, x: net.apply({"params": p}, x)["metric_depth"])
            return np.asarray(self._coarse_fn(self.params,
                                              image_lr))[0, ..., 0]
        # fine: tiled inference without fusion
        if self._fine_engine is None:
            from patchfusion_tpu.models.patchfusion import PatchFusionNet

            class _FineOnly:
                """Adapter giving a bare ZoeDepth branch the PatchFusionNet
                method surface the engine calls. Dispatches on `method` so a
                future engine call other than fine_forward fails loudly
                instead of silently running the wrong computation."""

                def __init__(self, net):
                    self.net = net
                    self.dtype = net.dtype  # crop_resize_tiles cast gate

                def apply(self, variables, *args, method=None, **kw):
                    if method is not PatchFusionNet.fine_forward:
                        raise NotImplementedError(
                            f"fine-only adapter got method="
                            f"{getattr(method, '__name__', method)!r}; only "
                            "fine_forward exists without a fusion model")
                    out = self.net.apply(variables, *args, **kw)
                    feats = [out["temp_features"][k] for k in (
                        "x_d0", "x_blocks_feat_0", "x_blocks_feat_1",
                        "x_blocks_feat_2", "x_blocks_feat_3",
                        "midas_final_feat")]
                    return out["metric_depth"], feats

            self._fine_engine = PatchFusionInference(
                _FineOnly(self.net), {"params": self.params}, self.tile_cfg,
                process_num=process_num, fusion=False, mesh=self.mesh,
                rn_times_process_num=True)
        return np.asarray(self._fine_engine.infer(
            image_lr, image_hr, cai_mode=cai_mode, rng=rng))


def _cast_tree_bf16(tree):
    import jax
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if getattr(x, "dtype", None) == jnp.float32 else x, tree)


def _to_nhwc(x):
    x = np.asarray(x)
    if x.ndim == 4 and x.shape[1] == 3:
        return np.moveaxis(x, 1, -1)
    return x


def _normalize_hub_config(raw: Dict[str, Any]) -> Dict[str, Any]:
    """The reference hub export stores the mmengine config (sometimes with
    dict-valued fields serialized as strings — see patchfusion.py:71-76);
    normalize to a plain dict."""
    import ast
    cfg = raw.get("config", raw)
    out = {}
    for k, v in cfg.items():
        if isinstance(v, str) and v.startswith(("{", "(", "[")):
            try:
                v = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                pass
        out[k] = v
    return out


def _init_variables(net, tile_cfg: TileConfig, seed: int) -> Dict[str, Any]:
    """Random-initialize without tracing the forward pass.

    `net.init` would trace (and on an accelerator, compile) the ENTIRE
    PatchFusion forward at canonical 4K-tile resolution just to draw random
    weights — minutes of compile for no compute. Instead the param shapes
    come from `jax.eval_shape` (abstract, instant) and values are drawn by
    name with the same distributions the modules declare:
      kernel -> lecun_normal (flax Conv/Dense default), bias -> zeros,
      scale -> ones, *_gamma -> ones (LayerScale init 1.0),
      pos_embed / absolute_pos_embed / relative_position_bias_table ->
      normal(0.02), cls_token -> normal(1e-6); BN stats -> (0, 1).
    """
    import jax

    pph, ppw = tile_cfg.patch_process_shape
    image_lr = jnp.zeros((1, pph, ppw, 3), jnp.float32)
    crops = jnp.zeros((1, pph, ppw, 3), jnp.float32)
    bboxs = jnp.asarray([[0.0, 0.0, tile_cfg.patch_raw_shape[1],
                          tile_cfg.patch_raw_shape[0]]], jnp.float32)
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), image_lr,
                            crops, bboxs)

    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    rng = np.random.default_rng(seed)
    leaves = []
    for path, s in flat:
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        shape, dtype = s.shape, s.dtype
        if name == "kernel":
            fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
            std = np.sqrt(1.0 / max(fan_in, 1)) / 0.87962566103423978
            v = np.clip(rng.standard_normal(shape), -2, 2) * std
        elif name in ("bias",):
            v = np.zeros(shape)
        elif name in ("scale", "ls1_gamma", "ls2_gamma", "var"):
            v = np.ones(shape)
        elif name in ("pos_embed", "absolute_pos_embed",
                      "relative_position_bias_table"):
            v = rng.standard_normal(shape) * 0.02
        elif name == "cls_token":
            v = rng.standard_normal(shape) * 1e-6
        else:  # mean and anything else
            v = np.zeros(shape)
        leaves.append(np.asarray(v, dtype))
    tree = jax.tree_util.tree_unflatten(treedef, leaves)
    return jax.device_put(tree)  # one batched transfer, not per-leaf


def _init_missing(net, tile_cfg: TileConfig, params: Dict[str, Any],
                  stats: Dict[str, Any], seed: int) -> Dict[str, Any]:
    """Fill any subtrees absent from the converted checkpoints (e.g. a
    missing fusion ckpt -> randomly-initialized fusion, the reference's
    strict=False load_dict behavior) with fresh init values."""
    init = _init_variables(net, tile_cfg, seed)
    merged_p = dict(init["params"])
    merged_p.update(params)
    merged_s = dict(init.get("batch_stats", {}))
    merged_s.update(stats)
    return {"params": merged_p, "batch_stats": merged_s}
