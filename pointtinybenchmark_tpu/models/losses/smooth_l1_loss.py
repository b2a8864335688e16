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


@LOSSES.register_module()
class BalancedL1Loss:
    """Libra R-CNN balanced L1 (reference mmdet/models/losses/
    balanced_l1_loss.py): gradient rebalancing between inliers/outliers.
    loss = a/b*(b|x|+1)ln(b|x|+1) - alpha|x|   for |x| < beta,
           gamma|x| + C                        otherwise."""

    def __init__(self, alpha: float = 0.5, gamma: float = 1.5,
                 beta: float = 1.0, loss_weight: float = 1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.beta = beta
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        a, g, beta = self.alpha, self.gamma, self.beta
        b = jnp.e ** (g / a) - 1
        diff = jnp.abs(pred - target)
        loss = jnp.where(
            diff < beta,
            a / b * (b * diff + 1) * jnp.log1p(b * diff / beta)
            - a * diff,
            g * diff + g / b - a * beta)
        if weight is not None:
            loss = loss * weight
        loss = loss.sum()
        if avg_factor is not None:
            loss = loss / jnp.maximum(avg_factor, 1.0)
        return self.loss_weight * loss
