"""mmengine-compatible configuration system (dependency-free).

The reference drives everything through `mmengine.Config.fromfile` with
`_base_` inheritance and `--cfg-options` deep-merge (reference
tools/train.py:48-85, configs/**). mmengine is not available in this image,
so this module reimplements the subset the configs rely on:

  * python config files executed in an isolated namespace
  * `_base_ = ['../path.py', ...]` recursive inheritance with dict deep-merge
    (later files / the child override earlier values key-by-key)
  * `_delete_=True` to replace instead of merge a dict
  * attribute-style access (`ConfigDict`)
  * `Config.fromfile`, `cfg.merge_from_dict({'a.b.c': v})`, `cfg.dump()`

Reference configs (e.g. configs/patchfusion_depthanything/
depthanything_vitl_patchfusion_u4k.py) load unmodified under this loader.
"""

from __future__ import annotations

import ast
import copy
import os
import types
from typing import Any, Dict


class ConfigDict(dict):
    """dict with attribute access, recursively applied."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        d = dict(*args, **kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _wrap(v):
        if isinstance(v, ConfigDict):
            return v
        if isinstance(v, dict):
            return ConfigDict(v)
        if isinstance(v, (list, tuple)):
            return type(v)(ConfigDict._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, self._wrap(v))

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __delattr__(self, k):
        try:
            del self[k]
        except KeyError:
            raise AttributeError(k)

    def __deepcopy__(self, memo):
        return ConfigDict({copy.deepcopy(k, memo): copy.deepcopy(v, memo)
                           for k, v in self.items()})

    def get(self, k, default=None):
        return super().get(k, default)

    def to_dict(self) -> Dict[str, Any]:
        def unwrap(v):
            if isinstance(v, ConfigDict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return type(v)(unwrap(x) for x in v)
            return v
        return unwrap(self)


def _merge_a_into_b(a: dict, b: dict) -> dict:
    """Deep-merge a (child / override) into b (base). mmengine semantics."""
    b = copy.deepcopy(b)
    for k, v in a.items():
        if isinstance(v, dict):
            delete = bool(v.get("_delete_", False))
            v = {kk: vv for kk, vv in v.items() if kk != "_delete_"}
            if k in b and isinstance(b[k], dict) and not delete:
                b[k] = _merge_a_into_b(v, b[k])
            else:
                b[k] = copy.deepcopy(v)
        else:
            b[k] = copy.deepcopy(v)
    return b


def _exec_config_file(path: str) -> Dict[str, Any]:
    path = os.path.abspath(path)
    with open(path, "r") as f:
        src = f.read()
    # validate syntax early with a clear error
    ast.parse(src, filename=path)
    module = types.ModuleType("_cfg_")
    module.__file__ = path
    exec(compile(src, path, "exec"), module.__dict__)
    cfg = {k: v for k, v in module.__dict__.items()
           if not k.startswith("__") and not isinstance(
               v, (types.ModuleType, types.FunctionType, type))}
    base = cfg.pop("_base_", None)
    if base is not None:
        if isinstance(base, str):
            base = [base]
        merged: Dict[str, Any] = {}
        for b in base:
            bcfg = _exec_config_file(os.path.join(os.path.dirname(path), b))
            merged = _merge_a_into_b(bcfg, merged)
        cfg = _merge_a_into_b(cfg, merged)
    return cfg


def _resolve_refs(node, root: dict):
    """Resolve `dict(_refer_='top_level_key', **overrides)` placeholders —
    an extension over mmengine (whose configs must inline shared blocks like
    zoe_depth_config in every file); overrides deep-merge over the referent.
    """
    if isinstance(node, dict):
        if "_refer_" in node:
            target = copy.deepcopy(root[node["_refer_"]])
            overrides = {k: v for k, v in node.items() if k != "_refer_"}
            merged = _merge_a_into_b(overrides, target)
            return _resolve_refs(merged, root)
        return {k: _resolve_refs(v, root) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return type(node)(_resolve_refs(v, root) for v in node)
    return node


class Config(ConfigDict):
    """mmengine.Config stand-in: fromfile / merge_from_dict / dump."""

    @staticmethod
    def fromfile(path: str) -> "Config":
        raw = _exec_config_file(path)
        cfg = Config(_resolve_refs(raw, raw))
        cfg.__dict__["_filename"] = path
        return cfg

    @property
    def filename(self):
        return self.__dict__.get("_filename")

    def merge_from_dict(self, options: Dict[str, Any]) -> None:
        """Merge flat {'a.b.c': v} CLI options (mmengine DictAction)."""
        for full_key, v in options.items():
            d = self
            keys = full_key.split(".")
            for k in keys[:-1]:
                if k not in d or not isinstance(d[k], dict):
                    d[k] = ConfigDict()
                d = d[k]
            d[keys[-1]] = v

    def dump(self, path: str) -> None:
        import pprint
        with open(path, "w") as f:
            for k, v in self.items():
                f.write(f"{k} = {pprint.pformat(v.to_dict() if isinstance(v, ConfigDict) else v)}\n")


def parse_cfg_option(s: str) -> Any:
    """Parse a --cfg-options value string like mmengine DictAction."""
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        lowered = s.lower()
        if lowered in ("true", "false"):
            return lowered == "true"
        if lowered in ("none", "null"):
            return None
        if "," in s:
            return tuple(parse_cfg_option(x) for x in s.split(","))
        return s
