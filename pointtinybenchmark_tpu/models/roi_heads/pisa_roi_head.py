"""PISA RoI head (arXiv 1904.04821).

Parity target: mmdet models/roi_heads/pisa_roi_head.py — StandardRoIHead
whose bbox loss applies ISR-P (IoU-HLR reweighting of positive label
weights) and adds CARL. train_cfg.rcnn surface: isr=dict(k, bias),
carl=dict(k, bias) (configs/pisa/pisa_faster_rcnn_r50_fpn_1x_coco.py:23).
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ...core.bbox import delta2bbox
from ...utils.registry import HEADS, LOSSES
from ..losses.pisa_loss import carl_loss, isr_p
from .standard_roi_head import StandardRoIHead

__all__ = ["PISARoIHead"]


@HEADS.register_module()
class PISARoIHead(StandardRoIHead):

    def _bbox_loss(self, cls_score, bbox_pred, roi_boxes, roi_labels,
                   roi_deltas, pos_w, samp_w, gt_idx
                   ) -> Dict[str, jnp.ndarray]:
        nc = self.num_classes
        means, stds = self._coder_params()
        b, s = roi_labels.shape
        g_off = (jnp.arange(b, dtype=jnp.int32) * (s + 1))[:, None]
        flat_gt_ids = (gt_idx + g_off).reshape(-1)
        labels_flat = roi_labels.reshape(-1)
        samp_flat = samp_w.reshape(-1)
        pos_flat = pos_w.reshape(-1) > 0
        rois_flat = roi_boxes.reshape(-1, 4)
        tgt_flat = roi_deltas.reshape(-1, 4)

        loss_cls_fn = LOSSES.build(dict(
            (self.bbox_head or {}).get("loss_cls",
                                       dict(type="CrossEntropyLoss"))))
        loss_bbox_fn = LOSSES.build(dict(
            (self.bbox_head or {}).get("loss_bbox",
                                       dict(type="L1Loss"))))
        if bbox_pred.shape[-1] == 4:
            pred_deltas = bbox_pred
        else:
            safe_lbl = jnp.clip(labels_flat, 0, nc - 1)
            pred_deltas = jnp.take_along_axis(
                bbox_pred.reshape(-1, nc, 4),
                safe_lbl[:, None, None], axis=1)[:, 0]

        label_w = samp_flat
        isr_cfg = (self.train_cfg or {}).get("isr")
        if isr_cfg is not None:
            decode = lambda r, d: delta2bbox(r, d, means, stds)
            label_w = isr_p(cls_score, labels_flat, label_w, tgt_flat,
                            rois_flat, pred_deltas, pos_flat, flat_gt_ids,
                            loss_cls_fn, decode,
                            k=float(isr_cfg.get("k", 2.0)),
                            bias=float(isr_cfg.get("bias", 0.0)))

        num_sampled = jnp.maximum(samp_flat.sum(), 1.0)
        loss_cls = loss_cls_fn(cls_score, labels_flat, weight=label_w,
                               avg_factor=num_sampled)
        loss_bbox = loss_bbox_fn(pred_deltas, tgt_flat,
                                 weight=pos_flat.astype(jnp.float32)[:, None],
                                 avg_factor=num_sampled)
        acc = (jnp.argmax(cls_score, -1) == labels_flat).astype(jnp.float32)
        acc = (acc * samp_flat).sum() / num_sampled * 100
        out = {"loss_cls": loss_cls, "loss_bbox": loss_bbox, "acc": acc,
               "num_pos": pos_flat.sum().astype(jnp.float32)}

        carl_cfg = (self.train_cfg or {}).get("carl")
        if carl_cfg is not None:
            out["loss_carl"] = carl_loss(
                cls_score, labels_flat, pred_deltas, tgt_flat, pos_flat,
                loss_bbox_fn, k=float(carl_cfg.get("k", 1.0)),
                bias=float(carl_cfg.get("bias", 0.2)),
                avg_factor=None, sigmoid=False)
        return out
