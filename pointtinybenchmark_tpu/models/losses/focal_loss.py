"""Sigmoid focal loss — pure-jnp formula (XLA fuses it; the reference wraps
an mmcv CUDA kernel, models/losses/focal_loss.py:4).

Semantics parity with mmdet: the target is given as integer labels where
`label == num_classes` means background (all-zero one-hot over the C
foreground logits).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES
from .utils import weight_reduce_loss

__all__ = ["sigmoid_focal_loss", "FocalLoss"]


def sigmoid_focal_loss(pred: jnp.ndarray,
                       target_onehot: jnp.ndarray,
                       gamma: float = 2.0,
                       alpha: float = 0.25) -> jnp.ndarray:
    """Elementwise focal loss on logits. pred/target_onehot: (..., C)."""
    p = jax.nn.sigmoid(pred)
    t = target_onehot.astype(pred.dtype)
    pt = (1 - p) * t + p * (1 - t)
    focal_weight = (alpha * t + (1 - alpha) * (1 - t)) * pt ** gamma
    # numerically-stable BCE with logits
    bce = jnp.maximum(pred, 0) - pred * t + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    return bce * focal_weight


@LOSSES.register_module()
class FocalLoss:
    def __init__(self, use_sigmoid: bool = True, gamma: float = 2.0,
                 alpha: float = 0.25, reduction: str = "mean",
                 loss_weight: float = 1.0):
        assert use_sigmoid, "only sigmoid focal loss is implemented"
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray,
                 weight: Optional[jnp.ndarray] = None,
                 avg_factor: Optional[jnp.ndarray] = None,
                 reduction_override: Optional[str] = None) -> jnp.ndarray:
        """pred: (N, C) logits; target: (N,) int labels in [0, C] where C=bg."""
        reduction = reduction_override or self.reduction
        num_classes = pred.shape[-1]
        onehot = jax.nn.one_hot(target, num_classes, dtype=pred.dtype)
        loss = sigmoid_focal_loss(pred, onehot, self.gamma, self.alpha)
        if weight is not None and weight.ndim == 1:
            weight = weight[:, None]
        loss = weight_reduce_loss(loss, weight, reduction, avg_factor)
        return self.loss_weight * loss
