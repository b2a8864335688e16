"""Model builders: registry build with dataclass-field filtering.

Reference configs carry torch-specific keys (`style`, `pretrained`,
`init_cfg`, conv/norm cfgs we map differently); `build_model` drops keys the
flax module doesn't declare so reference configs translate ~1:1
(SURVEY.md §7.1 registry design note).
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Optional

from ..utils.registry import BACKBONES, DETECTORS, HEADS, NECKS, Registry

logger = logging.getLogger("ptb_tpu")

__all__ = ["build_model", "build_backbone", "build_neck", "build_head",
           "build_detector"]


def build_model(cfg: dict, registry: Registry, default_args: Optional[dict] = None):
    if cfg is None:
        return None
    args = dict(cfg)
    obj_type = args.pop("type")
    cls = registry.get(obj_type) if isinstance(obj_type, str) else obj_type
    if cls is None:
        raise KeyError(f"{obj_type} not in {registry.name}: {sorted(registry.module_dict)}")
    if default_args:
        for k, v in default_args.items():
            args.setdefault(k, v)
    if dataclasses.is_dataclass(cls):
        field_names = {f.name for f in dataclasses.fields(cls)}
        dropped = sorted(set(args) - field_names)
        if dropped:
            logger.debug("build_model(%s): dropping unsupported config keys %s",
                         obj_type, dropped)
        args = {k: v for k, v in args.items() if k in field_names}
    # config-friendly dtype strings -> jnp dtypes (bfloat16 rides the MXU)
    if isinstance(args.get("dtype"), str):
        import jax.numpy as jnp
        args["dtype"] = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
                         "float16": jnp.float16}[args["dtype"]]

    # lists from configs must become (nested) tuples for flax dataclasses
    def _deep_tuple(v):
        if isinstance(v, (list, tuple)):
            return tuple(_deep_tuple(x) for x in v)
        return v

    args = {k: _deep_tuple(v) if isinstance(v, (list, tuple)) else v
            for k, v in args.items()}
    return cls(**args)


def build_backbone(cfg):
    return build_model(cfg, BACKBONES)


def build_neck(cfg):
    return build_model(cfg, NECKS)


def build_head(cfg, default_args=None):
    return build_model(cfg, HEADS, default_args)


def build_detector(cfg, train_cfg=None, test_cfg=None):
    default_args = {}
    if train_cfg is not None:
        default_args["train_cfg"] = train_cfg
    if test_cfg is not None:
        default_args["test_cfg"] = test_cfg
    return build_model(cfg, DETECTORS, default_args or None)
