"""Config system: Python-file configs with `_base_` inheritance and deep merge.

Behavior-parity target: mmcv.Config as used by the reference
(TOV_mmdetection/tools/train.py:89-95 — fromfile + merge_from_dict with
`--cfg-options a.b.c=v` dotted overrides; `_base_` multiple inheritance with
deep dict merge; `_delete_=True` to replace instead of merge).

Implementation is standalone: a config file is a plain Python file executed
in an isolated namespace; every non-dunder top-level name becomes a key.
"""
from __future__ import annotations

import ast
import copy
import os
import types
from typing import Any, Dict, List, Optional

BASE_KEY = "_base_"
DELETE_KEY = "_delete_"


class ConfigDict(dict):
    """dict with attribute access (cfg.model.backbone.depth)."""

    def __getattr__(self, name: str):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any):
        self[name] = value

    def __delattr__(self, name: str):
        try:
            del self[name]
        except KeyError:
            raise AttributeError(name)

    def copy(self) -> "ConfigDict":
        return ConfigDict(dict.copy(self))

    def __deepcopy__(self, memo):
        out = ConfigDict()
        memo[id(self)] = out
        for k, v in self.items():
            out[copy.deepcopy(k, memo)] = copy.deepcopy(v, memo)
        return out


def _to_configdict(obj: Any) -> Any:
    if isinstance(obj, dict):
        return ConfigDict({k: _to_configdict(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_configdict(v) for v in obj)
    return obj


def _exec_pyfile(filename: str) -> Dict[str, Any]:
    filename = os.path.abspath(os.path.expanduser(filename))
    if not os.path.isfile(filename):
        raise FileNotFoundError(filename)
    with open(filename, "r") as f:
        src = f.read()
    ast.parse(src, filename=filename)  # syntax check with good error messages
    ns: Dict[str, Any] = {"__file__": filename}
    code = compile(src, filename, "exec")
    exec(code, ns)
    return {
        k: v
        for k, v in ns.items()
        if not k.startswith("__") and not isinstance(v, types.ModuleType)
        and not callable(v) or k == BASE_KEY
    }


def merge_dict(base: Dict, new: Dict, allow_list_keys: bool = False) -> Dict:
    """Deep-merge `new` into a copy of `base` (new wins).

    A nested dict carrying `_delete_=True` replaces the base value wholesale.
    """
    out = copy.deepcopy(base)
    for k, v in new.items():
        if allow_list_keys and k.isdigit() and isinstance(out, list):
            idx = int(k)
            out[idx] = merge_dict(out[idx], v) if isinstance(v, dict) else v
            continue
        if isinstance(v, dict) and isinstance(out.get(k), dict) and not v.pop(DELETE_KEY, False):
            out[k] = merge_dict(out[k], v, allow_list_keys)
        else:
            if isinstance(v, dict):
                v = {kk: vv for kk, vv in v.items() if kk != DELETE_KEY}
            out[k] = copy.deepcopy(v)
    return out


class Config:
    """Top-level config object.

    cfg = Config.fromfile("configs/tinyperson/retinanet.py")
    cfg.merge_from_dict({"model.bbox_head.num_classes": 1})
    """

    def __init__(self, cfg_dict: Optional[Dict] = None, filename: Optional[str] = None):
        self._cfg_dict = _to_configdict(cfg_dict or {})
        self._filename = filename

    # -- loading ----------------------------------------------------------
    @staticmethod
    def fromfile(filename: str) -> "Config":
        cfg_dict = Config._load_with_bases(filename)
        return Config(cfg_dict, filename=filename)

    @staticmethod
    def _load_with_bases(filename: str) -> Dict[str, Any]:
        cfg_dict = _exec_pyfile(filename)
        base_files = cfg_dict.pop(BASE_KEY, [])
        if isinstance(base_files, str):
            base_files = [base_files]
        merged: Dict[str, Any] = {}
        cfg_dir = os.path.dirname(os.path.abspath(os.path.expanduser(filename)))
        for bf in base_files:
            base_dict = Config._load_with_bases(os.path.join(cfg_dir, bf))
            dup = set(merged) & set(base_dict)
            # later bases override earlier (deep-merged)
            merged = merge_dict(merged, base_dict) if dup else {**merged, **base_dict}
        return merge_dict(merged, cfg_dict)

    # -- access ------------------------------------------------------------
    @property
    def filename(self):
        return self._filename

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            return self._cfg_dict[name]
        except KeyError:
            raise AttributeError(name)

    def __getitem__(self, name):
        return self._cfg_dict[name]

    def __setattr__(self, name, value):
        if name.startswith("_"):
            super().__setattr__(name, value)
        else:
            self._cfg_dict[name] = _to_configdict(value)

    def __contains__(self, name):
        return name in self._cfg_dict

    def get(self, name, default=None):
        return self._cfg_dict.get(name, default)

    def keys(self):
        return self._cfg_dict.keys()

    def to_dict(self) -> Dict[str, Any]:
        return copy.deepcopy(dict(self._cfg_dict))

    # -- CLI overrides ------------------------------------------------------
    def merge_from_dict(self, options: Dict[str, Any], allow_list_keys: bool = True):
        """Merge dotted-key options, e.g. {"model.head.num_classes": 1}.

        Parity: mmcv Config.merge_from_dict (reference tools/train.py:89-91).
        """
        option_cfg: Dict[str, Any] = {}
        for full_key, v in options.items():
            d = option_cfg
            keys = full_key.split(".")
            for sub in keys[:-1]:
                d = d.setdefault(sub, {})
            d[keys[-1]] = v
        self._cfg_dict = _to_configdict(
            merge_dict(dict(self._cfg_dict), option_cfg, allow_list_keys=allow_list_keys))

    # -- dump ---------------------------------------------------------------
    def pretty_text(self) -> str:
        import pprint
        return pprint.pformat(self.to_dict(), width=100, sort_dicts=False)

    def dump(self, path: str):
        with open(path, "w") as f:
            f.write("cfg = " + self.pretty_text() + "\n")


def import_modules_from_strings(imports, allow_failed_imports: bool = False):
    """`custom_imports` support (mmcv utils/misc.py semantics; used by
    tools/train.py:93-95 in the reference): import the listed module paths
    so their @register_module side effects run before building."""
    import importlib
    import warnings

    if imports is None:
        return []
    if isinstance(imports, str):
        imports = [imports]
    imported = []
    for name in imports:
        try:
            imported.append(importlib.import_module(name))
        except ImportError:
            if not allow_failed_imports:
                raise
            warnings.warn(f"{name} failed to import and is ignored.",
                          UserWarning)
            imported.append(None)
    return imported


def parse_cfg_option(value: str) -> Any:
    """Parse a CLI `key=value` value string like mmcv's DictAction.

    Handles int/float/bool/None and comma-separated lists/tuples.
    """
    def _parse_atom(s: str) -> Any:
        s = s.strip()
        try:
            return ast.literal_eval(s)
        except (ValueError, SyntaxError):
            lowered = s.lower()
            if lowered in ("true", "false"):
                return lowered == "true"
            if lowered in ("none", "null"):
                return None
            return s

    if "," in value:
        parts = [p for p in value.split(",")]
        if parts and parts[-1] == "":
            parts = parts[:-1]
        return tuple(_parse_atom(p) for p in parts)
    return _parse_atom(value)
