"""SSDHead — single-shot detector head with hard negative mining.

Parity target: mmdet models/dense_heads/ssd_head.py — per-level conv preds
over SSD anchors, softmax CE with 3:1 hard negative mining, SmoothL1 box
regression.

TPU design: OHEM's dynamic negative selection becomes a static top-k over
per-anchor CE losses (k = 3 * num_pos enforced by rank masking).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import HEADS
from .anchor_head import AnchorHead

__all__ = ["SSDHead"]


@HEADS.register_module()
class SSDHead(AnchorHead):
    neg_pos_ratio: int = 3

    @property
    def use_sigmoid_cls(self) -> bool:
        return False  # SSD is softmax with background

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        cls_outs, reg_outs = [], []
        gen = self._build_generator()
        for i, f in enumerate(feats):
            na = gen.num_base_anchors[i] if i < gen.num_levels else \
                gen.num_base_anchors[-1]
            cls_outs.append(nn.Conv(na * self.cls_out_channels, (3, 3),
                                    padding=1, dtype=self.dtype,
                                    name=f"cls_conv{i}")(f))
            reg_outs.append(nn.Conv(na * 4, (3, 3), padding=1,
                                    dtype=self.dtype,
                                    name=f"reg_conv{i}")(f))
        return cls_outs, reg_outs

    def _flatten_preds(self, cls_outs, bbox_outs):
        b = cls_outs[0].shape[0]
        cls_cat = jnp.concatenate(
            [c.reshape(b, -1, self.cls_out_channels) for c in cls_outs], 1)
        box_cat = jnp.concatenate(
            [r.reshape(b, -1, 4) for r in bbox_outs], 1)
        return cls_cat, box_cat

    def loss(self, cls_outs, bbox_outs, batch: Dict[str, Any],
             rng=None) -> Dict[str, jnp.ndarray]:
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        anchors, anchor_valid = self.flat_anchors(featmap_sizes,
                                                  batch["pad_shape"])
        cls_cat, box_cat = self._flatten_preds(cls_outs, bbox_outs)
        b, n = cls_cat.shape[:2]
        labels, label_weights, bbox_targets, pos_mask = self.get_targets(
            anchors, anchor_valid, batch)
        num_pos = jnp.maximum(pos_mask.sum(), 1.0)

        logp = jax.nn.log_softmax(cls_cat, -1)
        ce = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        # hard negative mining: per image take top (neg_pos_ratio * num_pos)
        # negatives by CE loss
        neg_mask = (labels == self.num_classes) & (label_weights > 0)
        neg_ce = jnp.where(neg_mask, ce, -1.0)
        order = jnp.argsort(-neg_ce, axis=1)
        rank = jnp.zeros((b, n), jnp.int32)
        rank = jax.vmap(lambda o: jnp.zeros((n,), jnp.int32).at[o].set(
            jnp.arange(n, dtype=jnp.int32)))(order)
        num_pos_img = pos_mask.sum(1, keepdims=True)
        neg_keep = neg_mask & (rank < (self.neg_pos_ratio
                                       * num_pos_img).astype(jnp.int32))
        cls_w = pos_mask + neg_keep.astype(jnp.float32)
        loss_cls = (ce * cls_w).sum() / num_pos

        from ...utils.registry import LOSSES
        loss_bbox_fn = LOSSES.build(dict(
            self.loss_bbox or dict(type="SmoothL1Loss", beta=1.0,
                                   loss_weight=1.0)))
        loss_bbox = loss_bbox_fn(box_cat, bbox_targets,
                                 weight=pos_mask[..., None],
                                 avg_factor=num_pos)
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "num_pos": pos_mask.sum()}
