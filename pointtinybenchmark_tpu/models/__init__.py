from . import losses  # noqa: F401 — register losses
from .backbones.resnet import ResNet
from .builder import (build_backbone, build_detector, build_head, build_model,
                      build_neck)
from .dense_heads.cpr_head import CPRHead
from .dense_heads.p2p_head import P2PHead
from .detectors.single_stage import BasicLocator, SingleStageDetector
from .necks.fpn import FPN

__all__ = [
    "ResNet", "FPN", "P2PHead", "CPRHead", "SingleStageDetector",
    "BasicLocator",
    "build_model", "build_backbone", "build_neck", "build_head",
    "build_detector",
]
