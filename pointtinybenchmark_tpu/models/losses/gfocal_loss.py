"""Generalized Focal losses (QFL + DFL).

Parity target: mmdet models/losses/gfocal_loss.py — QualityFocalLoss
(soft IoU-quality targets on the label channel, |q - sigma|^beta modulation)
and DistributionFocalLoss (CE on the two bins bracketing the continuous
regression target).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES
from .utils import weight_reduce_loss

__all__ = ["QualityFocalLoss", "DistributionFocalLoss"]


@LOSSES.register_module()
class QualityFocalLoss:
    def __init__(self, use_sigmoid: bool = True, beta: float = 2.0,
                 reduction: str = "mean", loss_weight: float = 1.0):
        assert use_sigmoid
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred: jnp.ndarray,
                 target: Tuple[jnp.ndarray, jnp.ndarray],
                 weight: Optional[jnp.ndarray] = None,
                 avg_factor=None, reduction_override=None) -> jnp.ndarray:
        """pred (N, C) logits; target = (labels (N,), quality scores (N,))
        where label == C means background."""
        labels, scores = target
        reduction = reduction_override or self.reduction
        c = pred.shape[-1]
        sigma = jax.nn.sigmoid(pred)
        # negatives: all channels toward 0 with sigma^beta modulation
        bce0 = (jnp.maximum(pred, 0)
                + jnp.log1p(jnp.exp(-jnp.abs(pred))))  # BCE(pred, 0)
        loss = sigma ** self.beta * bce0
        # positives: label channel toward the quality score
        pos = labels < c
        safe = jnp.clip(labels, 0, c - 1)
        onehot = jax.nn.one_hot(safe, c, dtype=bool) & pos[:, None]
        q = scores[:, None]
        bce_q = (jnp.maximum(pred, 0) - pred * q
                 + jnp.log1p(jnp.exp(-jnp.abs(pred))))
        mod = jnp.abs(q - sigma) ** self.beta
        loss = jnp.where(onehot, mod * bce_q, loss)
        loss = loss.sum(-1)
        loss = weight_reduce_loss(loss, weight, reduction, avg_factor)
        return self.loss_weight * loss


@LOSSES.register_module()
class DistributionFocalLoss:
    def __init__(self, reduction: str = "mean", loss_weight: float = 0.25):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray,
                 weight: Optional[jnp.ndarray] = None,
                 avg_factor=None, reduction_override=None) -> jnp.ndarray:
        """pred (N, n_bins) logits over integer bins; target (N,) continuous
        in [0, n_bins - 1]."""
        reduction = reduction_override or self.reduction
        n_bins = pred.shape[-1]
        t = jnp.clip(target, 0, n_bins - 1 - 1e-4)
        lo = jnp.floor(t).astype(jnp.int32)
        hi = lo + 1
        w_hi = t - lo
        w_lo = 1.0 - w_hi
        logp = jax.nn.log_softmax(pred, -1)
        loss = -(w_lo * jnp.take_along_axis(logp, lo[:, None], -1)[:, 0]
                 + w_hi * jnp.take_along_axis(logp, hi[:, None], -1)[:, 0])
        loss = weight_reduce_loss(loss, weight, reduction, avg_factor)
        return self.loss_weight * loss
