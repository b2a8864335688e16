from . import scale_match, tiling  # noqa: F401 — register pipeline modules
from .coco import COCO
from .cocofmt import (CityscapesDataset, CocoFmtDataset,
                      DeepFashionDataset, LVISDataset)
from .dataset_wrappers import (ClassBalancedDataset, ConcatDataset,
                               RepeatDataset)
from .loader import (DataLoader, DetCollator, EpochSampler, GroupSampler,
                     prefetch_to_device)
from .transforms import (Collect, Compose, DefaultFormatBundle,
                         LoadAnnotations, LoadImageFromFile, Normalize, Pad,
                         RandomCrop, RandomFlip, Resize)
from .tiling import CroppedTilesFlipAug, generate_corner_dataset, tile_grid
from .device_pipeline import DevicePreprocessor
from .noise import generate_pseudo_bbox_for_point
from .voc import VOCDataset, WIDERFaceDataset

from ..utils.registry import DATASETS


def build_dataset(cfg):
    """dict -> registry build; list of dicts -> ConcatDataset (the reference
    builder's `data.train=[...]` convention, mmdet datasets/builder.py:53)."""
    if isinstance(cfg, (list, tuple)):
        from .dataset_wrappers import ConcatDataset
        return ConcatDataset(list(cfg))
    return DATASETS.build(dict(cfg))


__all__ = [
    "COCO", "CocoFmtDataset", "build_dataset", "Compose",
    "LoadImageFromFile", "LoadAnnotations", "Resize", "RandomFlip",
    "Normalize", "Pad", "RandomCrop", "Collect", "DefaultFormatBundle",
    "DataLoader", "DetCollator", "EpochSampler", "GroupSampler",
    "prefetch_to_device",
    "CroppedTilesFlipAug", "generate_corner_dataset", "tile_grid",
    "DevicePreprocessor",
    "generate_pseudo_bbox_for_point", "ConcatDataset", "RepeatDataset",
    "ClassBalancedDataset", "VOCDataset", "LVISDataset",
    "CityscapesDataset", "WIDERFaceDataset", "DeepFashionDataset",
]
