"""Multi-instance-learning bag losses for CPR.

Parity target: fork models/losses/multi_instance_learning_loss.py:122-243 —
MILLoss: per-bag probability = sum over bag points of
(cls prob x bag-softmax-normalized instance attention), scored with a
generalized-focal term  -(p-q)^2 * [q*log(p+eps) + (1-q)*log(1-p+eps)],
averaged over the number of non-empty bags. AllPosLoss treats every bag
point as an independent positive.

The reference's softmax-then-mask-then-L1-normalize over the bag dimension
equals a masked softmax, which is what we compute (identical math, fewer
ops).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES
from .utils import accuracy

__all__ = ["MILLoss", "AllPosLoss"]


def _masked_softmax(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    neg = jnp.finfo(x.dtype).min
    x = jnp.where(mask, x, neg)
    y = jax.nn.softmax(x, axis=axis)
    y = jnp.where(mask, y, 0.0)
    denom = jnp.sum(y, axis=axis, keepdims=True)
    return y / jnp.maximum(denom, 1e-12)


@LOSSES.register_module()
class MILLoss:
    def __init__(self, binary_ins: bool = False, loss_weight: float = 1.0,
                 eps: float = 1e-6, loss_type: str = "gfocal_loss"):
        self.binary_ins = binary_ins
        self.loss_weight = loss_weight
        self.eps = eps
        self.loss_type = loss_type

    def gfocal_loss(self, p: jnp.ndarray, q: jnp.ndarray, w=1.0) -> jnp.ndarray:
        l1 = (p - q) ** 2
        l2 = q * jnp.log(p + self.eps) + (1 - q) * jnp.log(1 - p + self.eps)
        return -(l1 * l2 * w).sum(-1)

    def __call__(self, bag_cls_prob: jnp.ndarray, bag_ins_outs: jnp.ndarray,
                 labels: jnp.ndarray, valid: jnp.ndarray,
                 weight: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """
        Args:
            bag_cls_prob: (B, N, C) probabilities per bag point.
            bag_ins_outs: (B, N, C) (or (B, N, 2C) with binary_ins) raw
                instance-attention scores.
            labels: (B,) int class of each bag.
            valid: (B, N, 1) or (B, N, C) bool/float mask of real bag points.
        Returns:
            (scalar loss, accuracy, num_sample)
        """
        b, n, c = bag_cls_prob.shape
        k = bag_ins_outs.shape[-1] // c
        prob_cls = bag_cls_prob[..., None]                    # (B, N, C, 1)
        ins = bag_ins_outs.reshape(b, n, c, k)                # (B, N, C, k)
        vmask = valid[..., None].astype(bool)                 # (B, N, 1/C, 1)
        vmask = jnp.broadcast_to(vmask, ins.shape)
        prob_ins = _masked_softmax(ins, vmask, axis=1)
        prob = (prob_cls * prob_ins).sum(axis=1)              # (B, C, k)

        label_weights = (valid.sum(axis=1) > 0).astype(jnp.float32)  # (B, 1/C)
        # accuracy over real (non-padded) bags only — the reference sees
        # exactly num_gts bags, we see padded rows with zero weight
        acc = accuracy(prob[..., 0], labels, mask=label_weights.sum(-1) > 0)
        onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)        # (B, C)
        num_sample = jnp.maximum(
            jnp.sum((label_weights.sum(-1) > 0).astype(jnp.float32)), 1.0)

        if k == 1:
            p = prob[..., 0]
            q = onehot
            w = label_weights
        else:  # binary_ins: positive and negative attention branches
            p = jnp.concatenate([prob[..., 0], prob[..., 1]], axis=0)
            q = jnp.concatenate([onehot, jnp.zeros_like(onehot)], axis=0)
            w = jnp.concatenate([label_weights, label_weights], axis=0)

        if self.loss_type == "gfocal_loss":
            loss = self.gfocal_loss(p, q, w)
        elif self.loss_type == "binary_cross_entropy":
            bce = -(q * jnp.log(p + self.eps) + (1 - q) * jnp.log(1 - p + self.eps))
            loss = (bce * w).sum(-1)
        else:
            raise ValueError(self.loss_type)
        if weight is not None:
            loss = loss * weight
        loss = loss.sum() / num_sample * self.loss_weight
        return loss, acc, num_sample


@LOSSES.register_module()
class AllPosLoss(MILLoss):
    """Every bag point is its own positive sample (fork :206-243)."""

    def __call__(self, bag_cls_prob, bag_ins_outs, labels, valid, weight=None):
        b, n, c = bag_cls_prob.shape
        prob = bag_cls_prob.reshape(b * n, c)
        labels_flat = jnp.repeat(labels[:, None], n, axis=1).reshape(-1)
        valid_flat = valid.reshape(b * n, -1).astype(jnp.float32)

        acc = accuracy(prob, labels_flat, mask=valid_flat[:, 0] > 0)
        onehot = jax.nn.one_hot(labels_flat, c, dtype=jnp.float32)
        num_sample = jnp.maximum(
            jnp.sum((valid_flat.sum(-1) > 0).astype(jnp.float32)), 1.0)

        if self.loss_type == "gfocal_loss":
            loss = self.gfocal_loss(prob, onehot, valid_flat)
        elif self.loss_type == "binary_cross_entropy":
            bce = -(onehot * jnp.log(prob + self.eps)
                    + (1 - onehot) * jnp.log(1 - prob + self.eps))
            loss = (bce * valid_flat).sum(-1)
        else:
            raise ValueError(self.loss_type)
        if weight is not None:
            loss = loss * weight
        loss = loss.sum() / num_sample * self.loss_weight
        return loss, acc, num_sample
