"""Smooth-L1 / L1 / MSE regression losses (mmdet parity)."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...utils.registry import LOSSES
from .utils import weight_reduce_loss

__all__ = ["SmoothL1Loss", "L1Loss", "MSELoss"]


@LOSSES.register_module()
class SmoothL1Loss:
    def __init__(self, beta: float = 1.0, reduction: str = "mean",
                 loss_weight: float = 1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight: Optional[jnp.ndarray] = None,
                 avg_factor=None, reduction_override=None):
        reduction = reduction_override or self.reduction
        diff = jnp.abs(pred - target)
        loss = jnp.where(diff < self.beta,
                         0.5 * diff * diff / self.beta,
                         diff - 0.5 * self.beta)
        loss = weight_reduce_loss(loss, weight, reduction, avg_factor)
        return self.loss_weight * loss


@LOSSES.register_module()
class L1Loss:
    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        loss = jnp.abs(pred - target)
        loss = weight_reduce_loss(loss, weight, reduction, avg_factor)
        return self.loss_weight * loss


@LOSSES.register_module()
class MSELoss:
    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        loss = (pred - target) ** 2
        loss = weight_reduce_loss(loss, weight, reduction, avg_factor)
        return self.loss_weight * loss
