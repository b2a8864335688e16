"""IoU-family regression losses (mmdet models/losses/iou_loss.py parity)."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...ops.iou import bbox_overlaps_aligned
from ...utils.registry import LOSSES
from .utils import weight_reduce_loss

__all__ = ["IoULoss", "GIoULoss", "DIoULoss", "CIoULoss",
           "BoundedIoULoss"]


@LOSSES.register_module()
class IoULoss:
    """-log(iou) (mmdet default linear=False)."""

    def __init__(self, linear: bool = False, eps: float = 1e-6,
                 reduction: str = "mean", loss_weight: float = 1.0):
        self.linear = linear
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight: Optional[jnp.ndarray] = None,
                 avg_factor=None, reduction_override=None):
        reduction = reduction_override or self.reduction
        ious = jnp.clip(bbox_overlaps_aligned(pred, target, eps=self.eps),
                        self.eps, None)
        loss = 1 - ious if self.linear else -jnp.log(ious)
        if weight is not None and weight.ndim == pred.ndim:
            weight = weight.mean(-1)
        loss = weight_reduce_loss(loss, weight, reduction, avg_factor)
        return self.loss_weight * loss


@LOSSES.register_module()
class GIoULoss:
    def __init__(self, eps: float = 1e-7, reduction: str = "mean",
                 loss_weight: float = 1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        gious = bbox_overlaps_aligned(pred, target, mode="giou", eps=self.eps)
        loss = 1 - gious
        if weight is not None and weight.ndim == pred.ndim:
            weight = weight.mean(-1)
        loss = weight_reduce_loss(loss, weight, reduction, avg_factor)
        return self.loss_weight * loss


@LOSSES.register_module()
class DIoULoss:
    def __init__(self, eps: float = 1e-7, reduction: str = "mean",
                 loss_weight: float = 1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        ious = bbox_overlaps_aligned(pred, target, eps=self.eps)
        # center distance over enclosing diagonal
        pcx = (pred[..., 0] + pred[..., 2]) * 0.5
        pcy = (pred[..., 1] + pred[..., 3]) * 0.5
        tcx = (target[..., 0] + target[..., 2]) * 0.5
        tcy = (target[..., 1] + target[..., 3]) * 0.5
        rho2 = (pcx - tcx) ** 2 + (pcy - tcy) ** 2
        ex1 = jnp.minimum(pred[..., 0], target[..., 0])
        ey1 = jnp.minimum(pred[..., 1], target[..., 1])
        ex2 = jnp.maximum(pred[..., 2], target[..., 2])
        ey2 = jnp.maximum(pred[..., 3], target[..., 3])
        c2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2 + self.eps
        loss = 1 - ious + rho2 / c2
        if weight is not None and weight.ndim == pred.ndim:
            weight = weight.mean(-1)
        loss = weight_reduce_loss(loss, weight, reduction, avg_factor)
        return self.loss_weight * loss


@LOSSES.register_module()
class CIoULoss:
    """Complete IoU (reference mmdet/models/losses/iou_loss.py::ciou_loss):
    DIoU + aspect-ratio consistency term v^2/(1-iou+v); the +eps on h1/h2
    and the un-detached v follow the reference exactly."""

    def __init__(self, eps: float = 1e-7, reduction: str = "mean",
                 loss_weight: float = 1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        ious = bbox_overlaps_aligned(pred, target, eps=self.eps)
        pcx = (pred[..., 0] + pred[..., 2]) * 0.5
        pcy = (pred[..., 1] + pred[..., 3]) * 0.5
        tcx = (target[..., 0] + target[..., 2]) * 0.5
        tcy = (target[..., 1] + target[..., 3]) * 0.5
        rho2 = (pcx - tcx) ** 2 + (pcy - tcy) ** 2
        ex1 = jnp.minimum(pred[..., 0], target[..., 0])
        ey1 = jnp.minimum(pred[..., 1], target[..., 1])
        ex2 = jnp.maximum(pred[..., 2], target[..., 2])
        ey2 = jnp.maximum(pred[..., 3], target[..., 3])
        c2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2 + self.eps
        w1 = pred[..., 2] - pred[..., 0]
        h1 = pred[..., 3] - pred[..., 1] + self.eps
        w2 = target[..., 2] - target[..., 0]
        h2 = target[..., 3] - target[..., 1] + self.eps
        factor = 4.0 / jnp.pi ** 2
        v = factor * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        loss = 1 - (ious - (rho2 / c2 + v ** 2 / (1 - ious + v)))
        if weight is not None and weight.ndim == pred.ndim:
            weight = weight.mean(-1)
        loss = weight_reduce_loss(loss, weight, reduction, avg_factor)
        return self.loss_weight * loss


@LOSSES.register_module()
class BoundedIoULoss:
    """Bounded IoU loss (arXiv 1711.00164; mmdet losses/iou_loss.py
    bounded_iou_loss) — smooth-L1 over per-coordinate bounded-IoU terms.
    Used by GuidedAnchorHead as loss_shape. Target terms are
    stop-gradiented (reference wraps them in no_grad)."""

    def __init__(self, beta: float = 0.2, eps: float = 1e-3,
                 reduction: str = "mean", loss_weight: float = 1.0):
        self.beta = beta
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight: Optional[jnp.ndarray] = None,
                 avg_factor=None, reduction_override=None):
        import jax
        reduction = reduction_override or self.reduction
        target = jax.lax.stop_gradient(target)
        pcx = (pred[..., 0] + pred[..., 2]) * 0.5
        pcy = (pred[..., 1] + pred[..., 3]) * 0.5
        pw = pred[..., 2] - pred[..., 0]
        ph = pred[..., 3] - pred[..., 1]
        tcx = (target[..., 0] + target[..., 2]) * 0.5
        tcy = (target[..., 1] + target[..., 3]) * 0.5
        tw = target[..., 2] - target[..., 0]
        th = target[..., 3] - target[..., 1]
        dx = jnp.abs(tcx - pcx)
        dy = jnp.abs(tcy - pcy)
        ldx = 1 - jnp.maximum((tw - 2 * dx) / (tw + 2 * dx + self.eps), 0.0)
        ldy = 1 - jnp.maximum((th - 2 * dy) / (th + 2 * dy + self.eps), 0.0)
        ldw = 1 - jnp.minimum(tw / (pw + self.eps), pw / (tw + self.eps))
        ldh = 1 - jnp.minimum(th / (ph + self.eps), ph / (th + self.eps))
        comb = jnp.stack([ldx, ldy, ldw, ldh], -1)
        loss = jnp.where(comb < self.beta,
                         0.5 * comb * comb / self.beta,
                         comb - 0.5 * self.beta)
        loss = weight_reduce_loss(loss, weight, reduction, avg_factor)
        return self.loss_weight * loss
