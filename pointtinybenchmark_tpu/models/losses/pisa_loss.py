"""PISA — Prime Sample Attention (arXiv 1904.04821).

Parity target: mmdet models/losses/pisa_loss.py (isr_p :8, carl_loss :122).

TPU redesign: the reference computes IoU-HLR with nested host loops over
unique labels and unique gts. Here both ranking levels are one segmented
rank: sort once by (group_id, -iou), recover each element's position within
its contiguous group via a cummax over segment starts, and scatter back —
all static-shape, jit-safe, O(N log N).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["segmented_rank", "isr_p", "carl_loss"]


def segmented_rank(group_id: jnp.ndarray, score: jnp.ndarray,
                   valid: jnp.ndarray) -> jnp.ndarray:
    """Rank of each element within its group, by descending score (0 = best).

    Invalid elements are pushed to a sentinel group and get arbitrary ranks
    (callers mask them out). Ties broken by original index (stable sort).
    """
    n = group_id.shape[0]
    gid = jnp.where(valid, group_id, n + 1).astype(jnp.float32)
    # lexicographic (gid, -score): scores normalized to (0, 1) to not bleed
    # across groups
    s = score - score.min()
    s = s / jnp.maximum(s.max(), 1e-12)
    key = gid * 4.0 + (1.0 - s)
    order = jnp.argsort(key)                      # stable
    sorted_gid = gid[order]
    idx = jnp.arange(n)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_gid[1:] != sorted_gid[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank_sorted = idx - seg_start
    return jnp.zeros((n,), jnp.int32).at[order].set(
        rank_sorted.astype(jnp.int32))


def isr_p(cls_score: jnp.ndarray, labels: jnp.ndarray,
          label_weights: jnp.ndarray, bbox_targets: jnp.ndarray,
          rois: jnp.ndarray, bbox_pred: jnp.ndarray, pos_mask: jnp.ndarray,
          gt_ids: jnp.ndarray, loss_cls, decode_fn, k: float = 2.0,
          bias: float = 0.0) -> jnp.ndarray:
    """Importance-based Sample Reweighting (positives). Returns new
    label_weights.

    Args mirror the reference (pisa_loss.py:8) with padded-batch semantics:
    everything is flat (N, ...) with `pos_mask` marking positives and
    `gt_ids` the assigned gt index (image-offset so ids are unique across
    the batch). `decode_fn(rois, deltas) -> boxes` closes over the head's
    coder params.
    """
    cls_score = jax.lax.stop_gradient(cls_score)
    bbox_pred = jax.lax.stop_gradient(bbox_pred)
    pred_boxes = decode_fn(rois, bbox_pred)
    target_boxes = decode_fn(rois, bbox_targets)
    from ...ops.iou import bbox_overlaps_aligned
    ious = bbox_overlaps_aligned(pred_boxes, target_boxes)
    ious = jnp.where(pos_mask, ious, 0.0)

    posf = pos_mask.astype(jnp.float32)
    num_pos = jnp.maximum(posf.sum(), 1.0)
    # max positives sharing one label (max_l_num)
    num_classes = cls_score.shape[-1]
    lbl_safe = jnp.clip(labels, 0, num_classes - 1)
    counts = jnp.zeros((num_classes,), jnp.float32).at[lbl_safe].add(posf)
    max_l_num = jnp.maximum(counts.max(), 1.0)

    # level 1: rank within each (label, gt) group by IoU
    pair_id = lbl_safe * (gt_ids.max() + 2) + gt_ids
    t_rank = segmented_rank(pair_id, ious, pos_mask)
    boosted = ious + (max_l_num - t_rank.astype(jnp.float32))
    # level 2: rank within each label group (IoU-HLR)
    l_rank = segmented_rank(lbl_safe, boosted, pos_mask)

    imp = label_weights * (max_l_num - l_rank.astype(jnp.float32)) / max_l_num
    imp = (bias + imp * (1 - bias)) ** k
    # renormalize so the weighted positive cls loss keeps its magnitude
    pos_loss = loss_cls(cls_score, labels, reduction_override="none")
    if pos_loss.ndim > 1:
        pos_loss = pos_loss.sum(-1)
    ori = (pos_loss * label_weights * posf).sum()
    new = (pos_loss * imp * posf).sum()
    ratio = ori / jnp.maximum(new, 1e-12)
    imp = imp * ratio
    return jnp.where(pos_mask, imp, label_weights)


def carl_loss(cls_score: jnp.ndarray, labels: jnp.ndarray,
              bbox_pred: jnp.ndarray, bbox_targets: jnp.ndarray,
              pos_mask: jnp.ndarray, loss_bbox, k: float = 1.0,
              bias: float = 0.2, avg_factor=None,
              sigmoid: bool = False) -> jnp.ndarray:
    """Classification-Aware Regression Loss (pisa_loss.py:122)."""
    num_classes = cls_score.shape[-1]
    lbl_safe = jnp.clip(labels, 0, num_classes - 1)
    if sigmoid:
        p = jax.nn.sigmoid(cls_score)
    else:
        p = jax.nn.softmax(cls_score, -1)
    pos_p = jnp.take_along_axis(p, lbl_safe[:, None], -1)[:, 0]
    w = (bias + (1 - bias) * pos_p) ** k
    posf = pos_mask.astype(jnp.float32)
    num_pos = jnp.maximum(posf.sum(), 1.0)
    w = w * num_pos / jnp.maximum((w * posf).sum(), 1e-12)
    if avg_factor is None:
        avg_factor = bbox_targets.shape[0]
    reg = loss_bbox(bbox_pred, bbox_targets,
                    reduction_override="none") / avg_factor
    if reg.ndim > 1:
        reg = reg.sum(-1)
    return (reg * w * posf).sum()
