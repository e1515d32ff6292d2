"""Type-name → constructor registries (reference estimator/registry/
registry.py:7-8 and estimator/{models,datasets}/builder.py, without the
mmengine dependency)."""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._registry: Dict[str, Callable] = {}

    def register_module(self, cls: Callable = None, *, name: str = None):
        def _register(c):
            self._registry[name or c.__name__] = c
            return c
        if cls is not None:
            return _register(cls)
        return _register

    def get(self, name: str) -> Callable:
        if name not in self._registry:
            raise KeyError(
                f"'{name}' is not registered in {self.name} "
                f"(available: {sorted(self._registry)})")
        return self._registry[name]

    def build(self, cfg: Dict[str, Any], **extra) -> Any:
        cfg = dict(cfg)
        type_name = cfg.pop("type")
        return self.get(type_name)(**cfg, **extra)


MODELS = Registry("models")
DATASETS = Registry("datasets")


def build_model(cfg, **extra):
    return MODELS.build(cfg, **extra)


def build_dataset(cfg, **extra):
    return DATASETS.build(cfg, **extra)
