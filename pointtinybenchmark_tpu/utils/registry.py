"""Registry: maps config `type=` strings to classes/callables.

Mirrors the behavior surface of mmcv's Registry as used by the reference
(see /root/reference TOV_mmdetection/mmdet/models/builder.py), but is a
small standalone implementation: a dict from name -> callable plus a
`build` that pops `type` from a config dict and instantiates.
"""
from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._module_dict: Dict[str, Callable] = {}

    def __repr__(self):
        return f"Registry(name={self._name}, items={list(self._module_dict)})"

    def __contains__(self, key: str) -> bool:
        return key in self._module_dict

    @property
    def name(self) -> str:
        return self._name

    @property
    def module_dict(self) -> Dict[str, Callable]:
        return dict(self._module_dict)

    def get(self, key: str) -> Optional[Callable]:
        return self._module_dict.get(key)

    def register_module(self, name: Optional[str] = None, module: Optional[Callable] = None, force: bool = False):
        """Use as decorator ``@REG.register_module()`` or direct call."""
        if module is not None:
            self._register(module, name=name, force=force)
            return module

        def _decorator(cls):
            self._register(cls, name=name, force=force)
            return cls

        return _decorator

    def _register(self, module: Callable, name: Optional[str] = None, force: bool = False):
        if not callable(module):
            raise TypeError(f"module must be callable, got {type(module)}")
        key = name if name is not None else module.__name__
        if not force and key in self._module_dict:
            raise KeyError(f"{key} is already registered in {self._name}")
        self._module_dict[key] = module

    def build(self, cfg: Dict[str, Any], default_args: Optional[Dict[str, Any]] = None):
        """Instantiate from a config dict with a `type` key.

        `type` may be a registered string or a callable directly.
        """
        if cfg is None:
            return None
        if not isinstance(cfg, dict):
            raise TypeError(f"cfg must be a dict, got {type(cfg)}")
        if "type" not in cfg:
            raise KeyError(f"cfg must contain the key 'type': {cfg}")
        args = dict(cfg)
        obj_type = args.pop("type")
        if isinstance(obj_type, str):
            obj_cls = self.get(obj_type)
            if obj_cls is None:
                raise KeyError(f"{obj_type} is not registered in {self._name}. "
                               f"Available: {sorted(self._module_dict)}")
        elif callable(obj_type):
            obj_cls = obj_type
        else:
            raise TypeError(f"type must be a str or callable, got {type(obj_type)}")
        if default_args is not None:
            for k, v in default_args.items():
                args.setdefault(k, v)
        try:
            return obj_cls(**args)
        except TypeError as e:
            raise TypeError(f"error building {obj_cls.__name__} from {self._name}: {e}") from e


# Global registries mirroring the reference's set
# (reference: TOV_mmdetection/mmdet/models/builder.py, datasets/builder.py,
#  core/bbox/builder.py, core/anchor/builder.py).
DATASETS = Registry("dataset")
PIPELINES = Registry("pipeline")
BACKBONES = Registry("backbone")
NECKS = Registry("neck")
HEADS = Registry("head")
LOSSES = Registry("loss")
DETECTORS = Registry("detector")
BBOX_ASSIGNERS = Registry("bbox_assigner")
BBOX_SAMPLERS = Registry("bbox_sampler")
BBOX_CODERS = Registry("bbox_coder")
MATCH_COSTS = Registry("match_cost")
ANCHOR_GENERATORS = Registry("anchor_generator")
IOU_CALCULATORS = Registry("iou_calculator")
EVALUATORS = Registry("evaluator")
HOOKS = Registry("hook")
OPTIMIZERS = Registry("optimizer")


def build_from_cfg(cfg, registry: Registry, default_args: Optional[dict] = None):
    return registry.build(cfg, default_args)
