"""Cross-entropy loss (softmax and sigmoid variants).

Parity: mmdet models/losses/cross_entropy_loss.py.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES
from .utils import weight_reduce_loss

__all__ = ["CrossEntropyLoss"]


def softmax_cross_entropy(pred: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(pred, axis=-1)
    safe = jnp.clip(label, 0, pred.shape[-1] - 1)
    return -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]


def binary_cross_entropy_with_logits(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))


@LOSSES.register_module()
class CrossEntropyLoss:
    def __init__(self, use_sigmoid: bool = False, use_mask: bool = False,
                 reduction: str = "mean", class_weight=None,
                 loss_weight: float = 1.0):
        assert not use_mask, "mask CE not implemented"
        self.use_sigmoid = use_sigmoid
        self.reduction = reduction
        self.class_weight = class_weight
        self.loss_weight = loss_weight

    def __call__(self, pred: jnp.ndarray, label: jnp.ndarray,
                 weight: Optional[jnp.ndarray] = None,
                 avg_factor: Optional[jnp.ndarray] = None,
                 reduction_override: Optional[str] = None) -> jnp.ndarray:
        reduction = reduction_override or self.reduction
        if self.use_sigmoid:
            if label.shape == pred.shape:
                # same-shape (possibly soft / multi-hot) binary targets,
                # e.g. SABL bucket-estimation labels (mmdet
                # binary_cross_entropy skips one-hot expansion then)
                onehot = label.astype(pred.dtype)
            else:
                # label in [0, C]: C = background -> all-zero one-hot
                num_classes = pred.shape[-1]
                onehot = jax.nn.one_hot(label, num_classes, dtype=pred.dtype)
            loss = binary_cross_entropy_with_logits(pred, onehot)
            if self.class_weight is not None:
                loss = loss * jnp.asarray(self.class_weight, pred.dtype)
            loss = loss.sum(-1) if loss.ndim > label.ndim else loss
        else:
            loss = softmax_cross_entropy(pred, label)
            if self.class_weight is not None:
                cw = jnp.asarray(self.class_weight, pred.dtype)
                loss = loss * cw[jnp.clip(label, 0, pred.shape[-1] - 1)]
        loss = weight_reduce_loss(loss, weight, reduction, avg_factor)
        return self.loss_weight * loss
