"""Detection post-processing: static-shape multiclass NMS.

Parity target: mmdet core/post_processing/bbox_nms.py multiclass_nms —
per-class score threshold + class-batched NMS + max_per_img cap. Dynamic
filtering becomes masking; outputs are fixed-size (max_per_img) with a
validity mask, so the whole path stays on-device under jit (the reference
runs mmcv CUDA NMS here; SURVEY.md §2.9).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.nms import batched_nms

__all__ = ["multiclass_nms", "DetResult"]


class DetResult(NamedTuple):
    bboxes: jnp.ndarray   # (max_per_img, 5) — x1,y1,x2,y2,score
    labels: jnp.ndarray   # (max_per_img,) int32
    valid: jnp.ndarray    # (max_per_img,) bool


@partial(jax.jit, static_argnames=("max_per_img", "pre_nms_limit"))
def multiclass_nms(multi_bboxes: jnp.ndarray,
                   multi_scores: jnp.ndarray,
                   score_thr: float,
                   iou_threshold: float,
                   max_per_img: int,
                   valid_mask: Optional[jnp.ndarray] = None,
                   pre_nms_limit: int = 20000,
                   score_factors: Optional[jnp.ndarray] = None) -> DetResult:
    """
    Args:
        multi_bboxes: (N, 4) (class-agnostic) or (N, C*4).
        multi_scores: (N, C+1) — last column is background (dropped), matching
            the reference convention.
        score_thr: drop candidates at or below this score.
        iou_threshold: NMS IoU threshold.
        max_per_img: static output size.
        valid_mask: (N,) bool for padded rows.
        pre_nms_limit: static cap on flattened (N*C) candidates fed to NMS.
        score_factors: (N,) multiplier (centerness / objectness) applied
            AFTER the score threshold, exactly like the reference
            (bbox_nms.py:55-62 "multiply score_factor after threshold to
            preserve more bboxes"); the output score is the product.
    """
    n = multi_scores.shape[0]
    num_classes = multi_scores.shape[1] - 1
    scores = multi_scores[:, :num_classes]                   # (N, C)
    if multi_bboxes.shape[-1] == 4:
        boxes = jnp.broadcast_to(multi_bboxes[:, None, :], (n, num_classes, 4))
    else:
        boxes = multi_bboxes.reshape(n, num_classes, 4)

    flat_scores = scores.reshape(-1)                         # (N*C,)
    flat_boxes = boxes.reshape(-1, 4)
    flat_labels = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), (n,))
    ok = flat_scores > score_thr
    if valid_mask is not None:
        ok = ok & jnp.repeat(valid_mask, num_classes)
    if score_factors is not None:
        flat_scores = flat_scores * jnp.repeat(score_factors, num_classes)
    flat_scores = jnp.where(ok, flat_scores, -1.0)

    # static candidate cap (keeps the NMS problem small)
    k = min(pre_nms_limit, flat_scores.shape[0])
    if k < flat_scores.shape[0]:
        top_scores, top_idx = jax.lax.top_k(flat_scores, k)
        top_boxes = flat_boxes[top_idx]
        top_labels = flat_labels[top_idx]
    else:
        # k == N: top_k would be a full sort for nothing — every NMS
        # route below orders by score itself (argmax loop / sorted
        # fixpoint / per-round top_k), so feed candidates unsorted.
        top_scores = flat_scores
        top_boxes = flat_boxes
        top_labels = flat_labels
    # NOTE: after the where() above every invalid entry is exactly -1 and
    # every surviving score/product is >= 0, so a threshold test recovers the
    # validity of the top-k rows. A boolean gather (`ok[top_idx]`) is
    # semantically identical but was observed to fault the TPU worker at
    # protocol shape (B=24 x 20k candidates) — keep the arithmetic form.
    top_valid = top_scores > -0.5

    keep_idx, num_kept = batched_nms(top_boxes, top_scores, top_labels,
                                     iou_threshold, max_per_img,
                                     valid_mask=top_valid)
    out_valid = keep_idx >= 0
    safe = jnp.where(out_valid, keep_idx, 0)
    out_boxes = top_boxes[safe]
    out_scores = jnp.where(out_valid, top_scores[safe], 0.0)
    out_labels = jnp.where(out_valid, top_labels[safe], -1)
    dets = jnp.concatenate([out_boxes, out_scores[:, None]], axis=1)
    dets = jnp.where(out_valid[:, None], dets, 0.0)
    return DetResult(dets, out_labels, out_valid)
