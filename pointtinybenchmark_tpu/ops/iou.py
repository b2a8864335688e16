"""Box overlap computations (IoU / IoF / GIoU) in pure JAX.

Parity target: reference TOV_mmdetection/mmdet/core/bbox/iou_calculators/
iou2d_calculator.py (bbox_overlaps). Boxes are [x1, y1, x2, y2]; the
coordinate convention is continuous (no +1), matching mmdet v2.

All functions are jit-safe with static shapes; invalid (padded) boxes should
be all-zero rows, which naturally produce zero overlap, or be masked by the
caller.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["bbox_overlaps", "bbox_overlaps_aligned"]


def bbox_overlaps(bboxes1: jnp.ndarray, bboxes2: jnp.ndarray,
                  mode: str = "iou", eps: float = 1e-6) -> jnp.ndarray:
    """Pairwise overlaps.

    Args:
        bboxes1: (..., M, 4)
        bboxes2: (..., N, 4)
        mode: "iou", "iof" (intersection over bboxes1's area) or "giou".
    Returns:
        (..., M, N)
    """
    assert mode in ("iou", "iof", "giou"), mode
    area1 = (bboxes1[..., 2] - bboxes1[..., 0]) * (bboxes1[..., 3] - bboxes1[..., 1])
    area2 = (bboxes2[..., 2] - bboxes2[..., 0]) * (bboxes2[..., 3] - bboxes2[..., 1])

    lt = jnp.maximum(bboxes1[..., :, None, :2], bboxes2[..., None, :, :2])  # (M, N, 2)
    rb = jnp.minimum(bboxes1[..., :, None, 2:], bboxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]

    if mode == "iof":
        union = area1[..., :, None]
    else:
        union = area1[..., :, None] + area2[..., None, :] - overlap
    union = jnp.maximum(union, eps)
    ious = overlap / union
    if mode in ("iou", "iof"):
        return ious
    # GIoU: subtract normalized enclosing-box slack
    enclosed_lt = jnp.minimum(bboxes1[..., :, None, :2], bboxes2[..., None, :, :2])
    enclosed_rb = jnp.maximum(bboxes1[..., :, None, 2:], bboxes2[..., None, :, 2:])
    enclose_wh = jnp.clip(enclosed_rb - enclosed_lt, 0, None)
    enclose_area = jnp.maximum(enclose_wh[..., 0] * enclose_wh[..., 1], eps)
    return ious - (enclose_area - union) / enclose_area


def bbox_overlaps_aligned(bboxes1: jnp.ndarray, bboxes2: jnp.ndarray,
                          mode: str = "iou", eps: float = 1e-6) -> jnp.ndarray:
    """Elementwise overlaps for aligned box lists of the same shape (..., 4)."""
    assert mode in ("iou", "iof", "giou"), mode
    area1 = (bboxes1[..., 2] - bboxes1[..., 0]) * (bboxes1[..., 3] - bboxes1[..., 1])
    area2 = (bboxes2[..., 2] - bboxes2[..., 0]) * (bboxes2[..., 3] - bboxes2[..., 1])
    lt = jnp.maximum(bboxes1[..., :2], bboxes2[..., :2])
    rb = jnp.minimum(bboxes1[..., 2:], bboxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]
    if mode == "iof":
        union = area1
    else:
        union = area1 + area2 - overlap
    union = jnp.maximum(union, eps)
    ious = overlap / union
    if mode in ("iou", "iof"):
        return ious
    enclosed_lt = jnp.minimum(bboxes1[..., :2], bboxes2[..., :2])
    enclosed_rb = jnp.maximum(bboxes1[..., 2:], bboxes2[..., 2:])
    enclose_wh = jnp.clip(enclosed_rb - enclosed_lt, 0, None)
    enclose_area = jnp.maximum(enclose_wh[..., 0] * enclose_wh[..., 1], eps)
    return ious - (enclose_area - union) / enclose_area
