from .gather import take_rows
from .grid_sample import grid_sample, point_sample, point_sample_pixel
from .iou import bbox_overlaps, bbox_overlaps_aligned
from .nms import batched_nms, nms, nms_fixpoint, nms_mask
from .roi_align import roi_align

__all__ = [
    "bbox_overlaps", "bbox_overlaps_aligned", "nms", "nms_fixpoint", "batched_nms",
    "nms_mask", "grid_sample", "point_sample", "point_sample_pixel",
    "roi_align", "take_rows",
]
