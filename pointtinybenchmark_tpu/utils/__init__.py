from .config import (Config, ConfigDict, import_modules_from_strings,
                     merge_dict, parse_cfg_option)
from .logging import collect_env, get_root_logger
from .registry import (ANCHOR_GENERATORS, BACKBONES, BBOX_ASSIGNERS,
                       BBOX_CODERS, BBOX_SAMPLERS, DATASETS, DETECTORS,
                       EVALUATORS, HEADS, HOOKS, IOU_CALCULATORS, LOSSES,
                       MATCH_COSTS, NECKS, OPTIMIZERS, PIPELINES, Registry,
                       build_from_cfg)

__all__ = [
    "Config", "ConfigDict", "import_modules_from_strings",
    "merge_dict", "parse_cfg_option",
    "get_root_logger", "collect_env", "Registry", "build_from_cfg",
    "DATASETS", "PIPELINES", "BACKBONES", "NECKS", "HEADS", "LOSSES",
    "DETECTORS", "BBOX_ASSIGNERS", "BBOX_SAMPLERS", "BBOX_CODERS",
    "MATCH_COSTS", "ANCHOR_GENERATORS", "IOU_CALCULATORS", "EVALUATORS",
    "HOOKS", "OPTIMIZERS",
]
