"""Match costs for Hungarian-style assignment.

Parity target: TOV_mmdetection/mmdet/core/bbox/match_costs/match_cost.py —
stock FocalLossCost / ClassificationCost / IoUCost / BBoxL1Cost plus the
fork's DisCostV2 (p-norm cdist between predicted and gt points, optional
image-size normalization, :190-215), IoUCostV2 (:217), ZeroCost (:223),
ClassificationCostV2 (:229).

All costs are pure-jnp functions of padded arrays; invalid gt columns are
masked by the assigner, not here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.registry import MATCH_COSTS
from ..ops.iou import bbox_overlaps

__all__ = ["FocalLossCost", "ClassificationCost", "ClassificationCostV2",
           "BBoxL1Cost", "IoUCost", "IoUCostV2", "DisCostV2", "ZeroCost"]


@MATCH_COSTS.register_module()
class FocalLossCost:
    def __init__(self, weight=1.0, alpha=0.25, gamma=2.0, eps=1e-12):
        self.weight = weight
        self.alpha = alpha
        self.gamma = gamma
        self.eps = eps

    def __call__(self, cls_pred: jnp.ndarray, gt_labels: jnp.ndarray) -> jnp.ndarray:
        """cls_pred: (N, C) logits; gt_labels: (G,) int -> (N, G)."""
        p = jax.nn.sigmoid(cls_pred)
        neg_cost = -jnp.log1p(-(p - self.eps)) * (1 - self.alpha) * p ** self.gamma
        pos_cost = -jnp.log(p + self.eps) * self.alpha * (1 - p) ** self.gamma
        gl = jnp.clip(gt_labels, 0, cls_pred.shape[-1] - 1)
        cost = pos_cost[:, gl] - neg_cost[:, gl]
        return cost * self.weight


@MATCH_COSTS.register_module()
class ClassificationCost:
    def __init__(self, weight=1.0):
        self.weight = weight

    def __call__(self, cls_pred: jnp.ndarray, gt_labels: jnp.ndarray) -> jnp.ndarray:
        score = jax.nn.softmax(cls_pred, axis=-1)
        gl = jnp.clip(gt_labels, 0, cls_pred.shape[-1] - 1)
        return -score[:, gl] * self.weight


@MATCH_COSTS.register_module()
class ClassificationCostV2:
    """Fork variant with a sigmoid option (match_cost.py:229-245)."""

    def __init__(self, weight=1.0, use_sigmoid=False):
        self.weight = weight
        self.use_sigmoid = use_sigmoid

    def __call__(self, cls_pred: jnp.ndarray, gt_labels: jnp.ndarray) -> jnp.ndarray:
        score = jax.nn.sigmoid(cls_pred) if self.use_sigmoid else jax.nn.softmax(cls_pred, axis=-1)
        gl = jnp.clip(gt_labels, 0, cls_pred.shape[-1] - 1)
        return -score[:, gl] * self.weight


@MATCH_COSTS.register_module()
class BBoxL1Cost:
    """L1 cdist cost (reference match_cost.py:9-51): bbox_pred arrives in
    normalized cxcywh (DETR convention); unless same_fmt, it is converted
    to xyxy ('xyxy' format) or the gt converted to cxcywh ('xywh')."""

    def __init__(self, weight=1.0, box_format="xyxy", same_fmt=False):
        assert box_format in ("xyxy", "xywh")
        self.weight = weight
        self.box_format = box_format
        self.same_fmt = same_fmt

    def __call__(self, bbox_pred: jnp.ndarray, gt_bboxes: jnp.ndarray,
                 img_meta=None) -> jnp.ndarray:
        if not self.same_fmt:
            from .bbox import cxcywh2xyxy, xyxy2cxcywh
            if self.box_format == "xywh":
                gt_bboxes = xyxy2cxcywh(gt_bboxes)
            else:
                bbox_pred = cxcywh2xyxy(bbox_pred)
        cost = jnp.sum(jnp.abs(bbox_pred[:, None, :] - gt_bboxes[None, :, :]), axis=-1)
        return cost * self.weight


@MATCH_COSTS.register_module()
class IoUCost:
    def __init__(self, iou_mode="giou", weight=1.0):
        self.iou_mode = iou_mode
        self.weight = weight

    def __call__(self, bboxes: jnp.ndarray, gt_bboxes: jnp.ndarray) -> jnp.ndarray:
        return -bbox_overlaps(bboxes, gt_bboxes, mode=self.iou_mode) * self.weight


@MATCH_COSTS.register_module()
class IoUCostV2(IoUCost):
    """img_meta-compatible signature (fork match_cost.py:217-221)."""

    def __call__(self, bboxes, gt_bboxes, img_meta=None):
        return super().__call__(bboxes, gt_bboxes)


@MATCH_COSTS.register_module()
class DisCostV2:
    """p-norm distance cost between predicted and gt points
    (fork match_cost.py:190-215). Coordinates are optionally normalized by
    (img_w, img_h) repeated k times before the cdist."""

    def __init__(self, weight=1.0, norm_with_img_wh=True, p=1):
        self.weight = weight
        self.norm_with_img_wh = norm_with_img_wh
        self.p = p

    def __call__(self, bbox_pred: jnp.ndarray, gt_bboxes: jnp.ndarray,
                 img_meta=None) -> jnp.ndarray:
        pred = bbox_pred
        gt = gt_bboxes
        if self.norm_with_img_wh:
            k = bbox_pred.shape[-1] // 2
            img_h, img_w = img_meta["img_shape"][:2]
            factor = jnp.asarray([img_w, img_h] * k, bbox_pred.dtype)
            pred = pred / factor
            gt = gt / factor
        diff = jnp.abs(pred[:, None, :] - gt[None, :, :])
        if self.p == 1:
            cost = jnp.sum(diff, axis=-1)
        elif self.p == 2:
            cost = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        else:
            cost = jnp.sum(diff ** self.p, axis=-1) ** (1.0 / self.p)
        return cost * self.weight


@MATCH_COSTS.register_module()
class ZeroCost:
    def __init__(self, weight=0.0):
        self.weight = weight

    def __call__(self, *args, **kwargs):
        return 0.0
