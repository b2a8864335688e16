from .anchors import AnchorGenerator, PointGenerator
from .assigners import (HungarianAssignerV2, MaxIoUAssigner,
                        topk_auction_match, topk_hungarian_match,
                        topk_hungarian_match_callback)
from .bbox import (bbox2delta, bbox2distance, bbox2roi, bbox_clip, bbox_flip,
                   bbox_mapping_back_tile, bbox_mapping_tile, bbox_rescale,
                   cxcywh2xyxy, delta2bbox, distance2bbox, xyxy2cxcywh)
from .match_costs import (BBoxL1Cost, ClassificationCost, ClassificationCostV2,
                          DisCostV2, FocalLossCost, IoUCost, IoUCostV2,
                          ZeroCost)
from .samplers import (PseudoSampler, RandomSampler, SamplingResult,
                       random_topk_mask)

__all__ = [
    "AnchorGenerator", "PointGenerator", "MaxIoUAssigner",
    "HungarianAssignerV2", "topk_hungarian_match",
    "topk_hungarian_match_callback", "topk_auction_match",
    "bbox2delta", "delta2bbox",
    "distance2bbox", "bbox2distance", "xyxy2cxcywh", "cxcywh2xyxy",
    "bbox_flip", "bbox_clip", "bbox_rescale", "bbox_mapping_tile",
    "bbox_mapping_back_tile", "bbox2roi", "FocalLossCost",
    "ClassificationCost", "ClassificationCostV2", "BBoxL1Cost", "IoUCost",
    "IoUCostV2", "DisCostV2", "ZeroCost", "RandomSampler", "PseudoSampler",
    "SamplingResult", "random_topk_mask",
]
