"""Minimal string-keyed component registry.

Capability-equivalent of the mm registries the reference builds everything
through (MODELS/HEADS/BACKBONES/NECKS/DATASETS/..., reference
mtl/model/build.py:7-88). Configs keep the reference's ``type`` names so
reference configs map 1:1.
"""

from __future__ import annotations

import copy
import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str, parent: Optional["Registry"] = None):
        self.name = name
        self._modules: Dict[str, Any] = {}
        self.parent = parent
        self.children: Dict[str, Registry] = {}
        if parent is not None:
            parent.children[name] = self

    def __contains__(self, key: str) -> bool:
        return key in self._modules

    def __len__(self) -> int:
        return len(self._modules)

    def keys(self):
        return self._modules.keys()

    def get(self, key: str) -> Any:
        if key in self._modules:
            return self._modules[key]
        for child in self.children.values():
            try:
                return child.get(key)
            except KeyError:
                continue
        if self.parent is not None and key in self.parent._modules:
            return self.parent._modules[key]
        raise KeyError(f"'{key}' not registered in registry '{self.name}' "
                       f"(known: {sorted(self._modules)})")

    def register_module(self, name: Optional[str] = None,
                        module: Optional[Any] = None,
                        force: bool = False) -> Callable:
        if module is not None:
            self._register(name or module.__name__, module, force)
            return module

        def deco(cls):
            self._register(name or cls.__name__, cls, force)
            return cls

        return deco

    def _register(self, name, module, force):
        if not force and name in self._modules:
            raise KeyError(f"'{name}' already registered in '{self.name}'")
        self._modules[name] = module

    def build(self, cfg: dict, **default_args: Any) -> Any:
        """Instantiate from ``{'type': Name, **kwargs}``."""
        if cfg is None:
            return None
        if not isinstance(cfg, dict) or "type" not in cfg:
            raise TypeError(f"registry build needs a dict with 'type', "
                            f"got {cfg!r}")
        cfg = copy.deepcopy(dict(cfg))
        obj_type = cfg.pop("type")
        if isinstance(obj_type, str):
            obj_cls = self.get(obj_type)
        elif inspect.isclass(obj_type) or inspect.isfunction(obj_type):
            obj_cls = obj_type
        else:
            raise TypeError(f"'type' must be str or class, got {obj_type!r}")
        for k, v in default_args.items():
            cfg.setdefault(k, v)
        return obj_cls(**cfg)


# Global registries, mirroring the reference's registry families.
MODELS = Registry("models")
BACKBONES = Registry("backbones", parent=MODELS)
NECKS = Registry("necks", parent=MODELS)
HEADS = Registry("heads", parent=MODELS)
TRANSFORMERS = Registry("transformers", parent=MODELS)
DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")
STRATEGIES = Registry("iteration_strategies")
HOOKS = Registry("hooks")
OPTIMIZER_BUILDERS = Registry("optimizer_builders")
