"""PISA RetinaNet head (arXiv 1904.04821).

Parity target: mmdet models/dense_heads/pisa_retinanet_head.py — standard
retina targets flattened over the batch, ISR-P reweights positive label
weights by IoU-hierarchical rank, CARL couples regression to the predicted
class score. train_cfg surface: isr=dict(k, bias), carl=dict(k, bias)
(configs/pisa/pisa_retinanet_r50_fpn_1x_coco.py:7).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ...core.bbox import delta2bbox
from ...utils.registry import HEADS, LOSSES
from ..losses.pisa_loss import carl_loss, isr_p
from .retina_head import RetinaHead
from .ssd_head import SSDHead

__all__ = ["PISARetinaHead", "PISASSDHead"]


@HEADS.register_module()
class PISARetinaHead(RetinaHead):

    def loss(self, cls_outs, bbox_outs, batch: Dict[str, Any],
             rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        anchors_np, anchor_valid = self.flat_anchors(featmap_sizes,
                                                     batch["pad_shape"])
        cls_cat, box_cat = self._flatten_preds(cls_outs, bbox_outs)
        b, n = cls_cat.shape[:2]
        g = batch["gt_bboxes"].shape[1]
        means, stds = self._coder_params()

        labels, label_w, bbox_t, pos_mask, gt_ids = self.get_targets(
            anchors_np, anchor_valid, batch, return_gt_ids=True)

        # flatten the batch (the reference ranks across the whole batch;
        # gt ids are offset per image so groups stay distinct)
        offs = (jnp.arange(b, dtype=jnp.int32) * g)[:, None]
        flat_gt_ids = (gt_ids + offs).reshape(-1)
        flat_labels = labels.reshape(-1)
        flat_lw = label_w.reshape(-1)
        flat_pos = pos_mask.reshape(-1) > 0
        flat_cls = cls_cat.reshape(b * n, -1)
        flat_box = box_cat.reshape(b * n, 4)
        flat_tgt = bbox_t.reshape(b * n, 4)
        flat_anchors = jnp.tile(jnp.asarray(anchors_np), (b, 1))

        loss_cls_fn = LOSSES.build(dict(self.loss_cls or dict(
            type="FocalLoss", use_sigmoid=True, gamma=2.0, alpha=0.25)))
        loss_bbox_fn = LOSSES.build(dict(self.loss_bbox or dict(
            type="SmoothL1Loss", beta=0.11)))
        decode = lambda r, d: delta2bbox(r, d, means, stds)

        isr_cfg = (self.train_cfg or {}).get("isr")
        if isr_cfg is not None:
            flat_lw = isr_p(flat_cls, flat_labels, flat_lw, flat_tgt,
                            flat_anchors, flat_box, flat_pos, flat_gt_ids,
                            loss_cls_fn, decode,
                            k=float(isr_cfg.get("k", 2.0)),
                            bias=float(isr_cfg.get("bias", 0.0)))

        num_pos = jnp.maximum(pos_mask.sum(), 1.0)
        loss_cls = loss_cls_fn(flat_cls, flat_labels, weight=flat_lw,
                               avg_factor=num_pos)
        loss_bbox = loss_bbox_fn(flat_box, flat_tgt,
                                 weight=flat_pos.astype(jnp.float32)[:, None],
                                 avg_factor=num_pos)
        out = {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "num_pos": num_pos}

        carl_cfg = (self.train_cfg or {}).get("carl")
        if carl_cfg is not None:
            out["loss_carl"] = carl_loss(
                flat_cls, flat_labels, flat_box, flat_tgt, flat_pos,
                loss_bbox_fn, k=float(carl_cfg.get("k", 1.0)),
                bias=float(carl_cfg.get("bias", 0.2)),
                avg_factor=num_pos, sigmoid=True)
        return out


@HEADS.register_module()
class PISASSDHead(SSDHead):
    """PISA SSD (mmdet models/dense_heads/pisa_ssd_head.py): SSD's hard-
    negative-mined CE, with ISR-P re-ranking the positive classification
    weights and CARL coupling regression to the class score."""

    def loss(self, cls_outs, bbox_outs, batch: Dict[str, Any],
             rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        anchors_np, anchor_valid = self.flat_anchors(featmap_sizes,
                                                     batch["pad_shape"])
        cls_cat, box_cat = self._flatten_preds(cls_outs, bbox_outs)
        b, n = cls_cat.shape[:2]
        g = batch["gt_bboxes"].shape[1]
        means, stds = self._coder_params()
        labels, label_w, bbox_t, pos_mask, gt_ids = self.get_targets(
            anchors_np, anchor_valid, batch, return_gt_ids=True)
        num_pos = jnp.maximum(pos_mask.sum(), 1.0)

        logp = jax.nn.log_softmax(cls_cat, -1)
        ce = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        neg_mask = (labels == self.num_classes) & (label_w > 0)
        neg_ce = jnp.where(neg_mask, ce, -1.0)
        rank = jax.vmap(lambda o: jnp.zeros((n,), jnp.int32).at[o].set(
            jnp.arange(n, dtype=jnp.int32)))(jnp.argsort(-neg_ce, axis=1))
        num_pos_img = pos_mask.sum(1, keepdims=True)
        neg_keep = neg_mask & (rank < (self.neg_pos_ratio
                                       * num_pos_img).astype(jnp.int32))
        cls_w = pos_mask + neg_keep.astype(jnp.float32)

        # ISR-P on the flattened batch (softmax CE closure)
        offs = (jnp.arange(b, dtype=jnp.int32) * g)[:, None]
        flat_gt_ids = (gt_ids + offs).reshape(-1)
        flat_labels = labels.reshape(-1)
        flat_pos = pos_mask.reshape(-1) > 0
        flat_cls = cls_cat.reshape(b * n, -1)
        flat_box = box_cat.reshape(b * n, 4)
        flat_tgt = bbox_t.reshape(b * n, 4)
        flat_anchors = jnp.tile(jnp.asarray(anchors_np), (b, 1))
        decode = lambda r, d: delta2bbox(r, d, means, stds)
        def ce_fn(scores, lbls, weight=None, avg_factor=None,
                  reduction_override=None):
            per = -jnp.take_along_axis(jax.nn.log_softmax(scores, -1),
                                       lbls[..., None], -1)[..., 0]
            if weight is not None:
                per = per * weight
            if reduction_override == "none":
                return per
            return per.sum() / (avg_factor if avg_factor is not None else 1.0)

        isr_cfg = (self.train_cfg or {}).get("isr",
                                             dict(k=2.0, bias=0.25))
        flat_w = isr_p(flat_cls, flat_labels, cls_w.reshape(-1), flat_tgt,
                       flat_anchors, flat_box, flat_pos, flat_gt_ids,
                       ce_fn, decode, k=float(isr_cfg.get("k", 2.0)),
                       bias=float(isr_cfg.get("bias", 0.25)))
        loss_cls = (ce.reshape(-1) * flat_w).sum() / num_pos

        from ...utils.registry import LOSSES as _L
        loss_bbox_fn = _L.build(dict(
            self.loss_bbox or dict(type="SmoothL1Loss", beta=1.0)))
        loss_bbox = loss_bbox_fn(flat_box, flat_tgt,
                                 weight=flat_pos.astype(
                                     jnp.float32)[:, None],
                                 avg_factor=num_pos)
        out = {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "num_pos": pos_mask.sum()}
        carl_cfg = (self.train_cfg or {}).get("carl",
                                              dict(k=1.0, bias=0.2))
        out["loss_carl"] = carl_loss(
            flat_cls, flat_labels, flat_box, flat_tgt, flat_pos,
            loss_bbox_fn, k=float(carl_cfg.get("k", 1.0)),
            bias=float(carl_cfg.get("bias", 0.2)), avg_factor=num_pos,
            sigmoid=False)
        return out
