"""Loss reduction helpers (mmdet models/losses/utils.py parity)."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

__all__ = ["weight_reduce_loss", "reduce_loss", "accuracy"]


def reduce_loss(loss: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "none":
        return loss
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    raise ValueError(reduction)


def weight_reduce_loss(loss: jnp.ndarray,
                       weight: Optional[jnp.ndarray] = None,
                       reduction: str = "mean",
                       avg_factor: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """elementwise weight, then reduce; with avg_factor, mean = sum/avg_factor."""
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return reduce_loss(loss, reduction)
    if reduction == "mean":
        return loss.sum() / jnp.maximum(avg_factor, 1e-12)
    if reduction == "none":
        return loss
    raise ValueError("avg_factor can not be used with reduction='sum'")


def accuracy(pred: jnp.ndarray, target: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """top-1 accuracy; pred (N, C) scores, target (N,) labels."""
    correct = (jnp.argmax(pred, axis=-1) == target).astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        return (correct * m).sum() / jnp.maximum(m.sum(), 1.0) * 100.0
    return correct.mean() * 100.0
