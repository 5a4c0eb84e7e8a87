"""Config system.

Capability-equivalent of the reference's mmcv ``Config`` usage (see
/root/reference tools/train.py:119-125, mtl/data/build.py:31-40):

* Python-file configs: a config is a ``.py`` file whose module-level
  variables form a dict tree.
* ``_base_`` inheritance (string or list of relative paths), deep-merged
  child-over-base.
* ``_delete_=True`` inside a child dict replaces the base subtree instead of
  merging into it.
* ``{{_base_.var}}`` textual substitution: a child file may reference values
  from its composed base namespace.
* ``${a.b.c}`` post-composition string interpolation (mmcv
  ``replace_cfg_vals``).
* ``merge_from_dict`` for dotted CLI overrides (``--cfg-options a.b=c``).
* ``load_data_cfg``: the RSCoTr two-level composition — each entry of
  ``cfg.data`` may carry ``config: <path>`` pointing at a per-dataset config
  file which is loaded and inlined, with sibling keys deep-merged over it.

Implementation is from scratch (no mmcv): configs execute in a sandboxed
namespace, values become ``ConfigDict`` (attribute-access dicts).
"""

from __future__ import annotations

import ast
import copy
import os
import re
import sys
import types
from typing import Any, Dict, List, Optional, Union

BASE_KEY = "_base_"
DELETE_KEY = "_delete_"
RESERVED_KEYS = ("filename", "text")


class ConfigDict(dict):
    """Dict with attribute access, raising informative AttributeError."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(
                f"'ConfigDict' object has no attribute '{name}'")

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError:
            raise AttributeError(name)

    def __deepcopy__(self, memo):
        out = ConfigDict()
        memo[id(self)] = out
        for k, v in self.items():
            out[copy.deepcopy(k, memo)] = copy.deepcopy(v, memo)
        return out

    def copy(self) -> "ConfigDict":
        return copy.deepcopy(self)


def _to_config_dict(obj: Any) -> Any:
    if isinstance(obj, dict):
        return ConfigDict({k: _to_config_dict(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_config_dict(v) for v in obj)
    return obj


def _to_plain(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_plain(v) for v in obj)
    return obj


def deep_merge(base: dict, child: dict, allow_list_keys: bool = False) -> dict:
    """Merge ``child`` over ``base`` (both plain or Config dicts).

    A child dict containing ``_delete_: True`` replaces the base subtree.
    With ``allow_list_keys``, integer-string keys index into base lists
    (used by merge_from_dict, matching mmcv semantics).
    """
    if not isinstance(base, dict):
        return copy.deepcopy(child)
    out = copy.deepcopy(base)
    for key, val in child.items():
        if key == DELETE_KEY:
            continue
        if (allow_list_keys and isinstance(val, dict)
                and isinstance(out.get(key), list)
                and all(isinstance(k, str) and k.isdigit() for k in val)):
            lst = out[key]
            for k, v in val.items():
                idx = int(k)
                if idx >= len(lst):
                    raise KeyError(f"index {idx} out of range for list of "
                                   f"length {len(lst)} at key '{key}'")
                lst[idx] = deep_merge(lst[idx], v, allow_list_keys) \
                    if isinstance(v, dict) else copy.deepcopy(v)
            continue
        if isinstance(val, dict):
            if val.get(DELETE_KEY, False):
                merged = {k: v for k, v in val.items() if k != DELETE_KEY}
                out[key] = copy.deepcopy(merged)
            elif key in out and isinstance(out.get(key), dict):
                out[key] = deep_merge(out[key], val, allow_list_keys)
            else:
                out[key] = copy.deepcopy(val)
        else:
            out[key] = copy.deepcopy(val)
    return out


_BASE_REF_RE = re.compile(r"\{\{\s*_base_\.([\w.]+)\s*\}\}")
_VAR_REF_RE = re.compile(r"\$\{([\w.]+)\}")


def _get_dotted(tree: dict, dotted: str) -> Any:
    cur: Any = tree
    for part in dotted.split("."):
        cur = cur[part]
    return cur


def _exec_pyfile(path: str, base_vars: dict) -> dict:
    with open(path, "r") as f:
        text = f.read()
    # {{_base_.x.y}} -> runtime lookup into the composed base namespace.
    text = _BASE_REF_RE.sub(lambda m: f'_base_ref_("{m.group(1)}")', text)
    code = compile(text, path, "exec")
    ns: Dict[str, Any] = {
        "__file__": path,
        "_base_ref_": lambda dotted: copy.deepcopy(
            _get_dotted(base_vars, dotted)),
        "os": os,
    }
    exec(code, ns)
    cfg = {
        k: v for k, v in ns.items()
        if not k.startswith("__") and k not in ("_base_ref_", "os")
        and not isinstance(v, (types.ModuleType, types.FunctionType, type))
    }
    return cfg


def _load_file(path: str) -> dict:
    path = os.path.abspath(os.path.expanduser(path))
    if not os.path.isfile(path):
        raise FileNotFoundError(f"config file not found: {path}")
    if path.endswith(".json"):
        import json
        with open(path) as f:
            return {BASE_KEY: [], **json.load(f)}
    if not path.endswith(".py"):
        raise ValueError(f"unsupported config format: {path}")

    # First pass: discover _base_ without executing {{...}} refs.
    base_paths: List[str] = []
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    for node in tree.body:
        if (isinstance(node, ast.Assign) and len(node.targets) == 1
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id == BASE_KEY):
            val = ast.literal_eval(node.value)
            base_paths = [val] if isinstance(val, str) else list(val)

    base_vars: dict = {}
    for bp in base_paths:
        bfile = os.path.join(os.path.dirname(path), bp)
        bcfg = _load_file(bfile)
        dup = set(base_vars) & set(bcfg)
        # later bases win on conflict (deep-merged)
        base_vars = deep_merge(base_vars, bcfg)
        del dup

    child = _exec_pyfile(path, base_vars)
    child.pop(BASE_KEY, None)
    return deep_merge(base_vars, child)


def replace_cfg_vals(tree: dict) -> dict:
    """Resolve ``${a.b.c}`` references in string values against the tree."""

    def resolve(obj: Any) -> Any:
        if isinstance(obj, str):
            m = _VAR_REF_RE.fullmatch(obj)
            if m is not None:
                try:
                    return copy.deepcopy(_get_dotted(tree, m.group(1)))
                except (KeyError, TypeError):
                    return obj

            def sub(mm):
                try:
                    return str(_get_dotted(tree, mm.group(1)))
                except (KeyError, TypeError):
                    return mm.group(0)

            return _VAR_REF_RE.sub(sub, obj)
        if isinstance(obj, dict):
            return {k: resolve(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return type(obj)(resolve(v) for v in obj)
        return obj

    return resolve(tree)


def import_modules_from_strings(imports, allow_failed_imports: bool = False):
    """mmcv ``import_modules_from_strings`` equivalent: import modules by
    dotted name for their registry-registration side effects. ``imports``
    is one dotted name or a list; failures raise ImportError unless
    ``allow_failed_imports`` (then warn and record None)."""
    import importlib
    import warnings
    if not imports:
        return []
    single = isinstance(imports, str)
    names = [imports] if single else list(imports)
    modules = []
    for name in names:
        if not isinstance(name, str):
            raise TypeError(f"custom import name must be str, got "
                            f"{type(name).__name__}: {name!r}")
        try:
            modules.append(importlib.import_module(name))
        except ImportError:
            if not allow_failed_imports:
                raise
            warnings.warn(f"{name} failed to import and is ignored",
                          UserWarning)
            modules.append(None)
    return modules[0] if single else modules


class Config:
    """Composed configuration with attribute access.

    ``Config.fromfile(path)`` composes ``_base_`` chains; the result behaves
    like a ConfigDict plus ``filename`` / ``dump`` / ``merge_from_dict``.
    """

    def __init__(self, cfg_dict: Optional[dict] = None,
                 filename: Optional[str] = None):
        cfg_dict = cfg_dict or {}
        for k in RESERVED_KEYS:
            if k in cfg_dict:
                raise KeyError(f"'{k}' is reserved")
        object.__setattr__(self, "_cfg_dict", _to_config_dict(cfg_dict))
        object.__setattr__(self, "_filename", filename)

    # -- construction ------------------------------------------------------
    @staticmethod
    def fromfile(path: str, resolve_vars: bool = True,
                 import_custom_modules: bool = True) -> "Config":
        tree = _load_file(path)
        if resolve_vars:
            tree = replace_cfg_vals(tree)
        if import_custom_modules and tree.get("custom_imports"):
            # mmcv Config.fromfile capability: a config can register its
            # own modules (user datasets/models/hooks self-register with
            # the registries on import) — reference configs carry
            # custom_imports=dict(imports='models.multi', ...) for this
            # (/root/reference/configs/multi/MTL_slvlcls_…&dior&potsdam
            # .py:239-241). The key stays in the config, as in mmcv.
            # Reference 'models.*' names (the reference repo's own model
            # package) resolve to rscotr_tpu.models, whose import performs
            # the same registrations — so unmodified reference configs run.
            ci = dict(tree["custom_imports"])
            imports = ci.get("imports") or []
            names = [imports] if isinstance(imports, str) else list(imports)
            mapped, seen = [], set()
            for n in names:
                if isinstance(n, str) and (n == "models"
                                           or n.startswith("models.")):
                    n = "rscotr_tpu.models"
                if n not in seen:
                    seen.add(n)
                    mapped.append(n)
            ci["imports"] = mapped
            import_modules_from_strings(**ci)
        return Config(tree, filename=os.path.abspath(path))

    @staticmethod
    def fromdict(d: dict) -> "Config":
        return Config(copy.deepcopy(d))

    # -- accessors ----------------------------------------------------------
    @property
    def filename(self) -> Optional[str]:
        return self._filename

    def __getattr__(self, name: str) -> Any:
        return getattr(self._cfg_dict, name)

    def __setattr__(self, name: str, value: Any) -> None:
        self._cfg_dict[name] = _to_config_dict(value)

    def __getitem__(self, key):
        return self._cfg_dict[key]

    def __setitem__(self, key, value):
        self._cfg_dict[key] = _to_config_dict(value)

    def __contains__(self, key):
        return key in self._cfg_dict

    def __iter__(self):
        return iter(self._cfg_dict)

    def __len__(self):
        return len(self._cfg_dict)

    def get(self, key, default=None):
        return self._cfg_dict.get(key, default)

    def pop(self, key, *default):
        return self._cfg_dict.pop(key, *default)

    def keys(self):
        return self._cfg_dict.keys()

    def items(self):
        return self._cfg_dict.items()

    def values(self):
        return self._cfg_dict.values()

    def setdefault(self, key, default=None):
        return self._cfg_dict.setdefault(key, _to_config_dict(default))

    def to_dict(self) -> dict:
        return _to_plain(self._cfg_dict)

    def copy(self) -> "Config":
        return Config(self.to_dict(), filename=self._filename)

    def __repr__(self):
        return f"Config(file={self._filename}): {dict(self._cfg_dict)!r}"

    # -- mutation ------------------------------------------------------------
    def merge_from_dict(self, options: Dict[str, Any],
                        allow_list_keys: bool = True) -> None:
        """Merge dotted-key options, e.g. ``{'model.backbone.depth': 50}``."""
        nested: dict = {}
        for full_key, v in options.items():
            d = nested
            parts = full_key.split(".")
            for part in parts[:-1]:
                d = d.setdefault(part, {})
            d[parts[-1]] = v
        merged = deep_merge(_to_plain(self._cfg_dict), nested,
                            allow_list_keys=allow_list_keys)
        object.__setattr__(self, "_cfg_dict", _to_config_dict(merged))

    def dump(self, path: Optional[str] = None) -> Optional[str]:
        """Serialize to a Python-literal config file (or return the text)."""
        import pprint
        lines = []
        for k, v in self._cfg_dict.items():
            lines.append(f"{k} = {pprint.pformat(_to_plain(v), width=88)}")
        text = "\n".join(lines) + "\n"
        if path is None:
            return text
        with open(path, "w") as f:
            f.write(text)
        return None


def parse_cfg_option_value(raw: str) -> Any:
    """Parse a CLI override value: int/float/bool/None/lists/tuples/str."""
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        pass
    low = raw.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low in ("none", "null"):
        return None
    if "," in raw:
        items = [parse_cfg_option_value(x) for x in raw.split(",") if x != ""]
        return items
    return raw


class DictAction:
    """argparse action factory: ``--cfg-options a.b=1 c=2,3``.

    Usage: ``parser.add_argument('--cfg-options', nargs='+',
    action=DictAction.action())``.
    """

    @staticmethod
    def action():
        import argparse

        class _Action(argparse.Action):
            def __call__(self, parser, namespace, values, option_string=None):
                opts = getattr(namespace, self.dest, None) or {}
                for kv in values:
                    key, _, val = kv.partition("=")
                    opts[key] = parse_cfg_option_value(val)
                setattr(namespace, self.dest, opts)

        return _Action
