"""SABL RoI head — side-aware boundary localization in the second stage.

Parity target: mmdet models/roi_heads/bbox_heads/sabl_head.py (loss :~420,
get_bboxes) driven through StandardRoIHead: bucket targets from
core/bbox.bbox2bucket (cls_ignore_neighbor semantics), CE on side-bucket
logits (sigmoid), SmoothL1(beta 0.1) on in-bucket offsets, decode via
bucket2bbox with the bucket-confidence factor multiplying the class score.

The matched gt box is recovered exactly from the stored DeltaXYWH targets
(delta2bbox o bbox2delta is an exact round trip), so the standard sampling
path needs no change.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ...core.bbox import bbox2bucket, bucket2bbox, delta2bbox
from ...core.post_processing import multiclass_nms
from ...utils.registry import HEADS, LOSSES
from .standard_roi_head import StandardRoIHead

__all__ = ["SABLRoIHead"]


@HEADS.register_module()
class SABLRoIHead(StandardRoIHead):

    @property
    def _sabl_cfg(self) -> dict:
        return dict(self.bbox_head or {})

    @property
    def _num_buckets(self) -> int:
        return int(self._sabl_cfg.get("num_buckets", 14))

    @property
    def _scale_factor(self) -> float:
        return float(self._sabl_cfg.get("scale_factor",
                                        self._sabl_cfg.get(
                                            "bucket_scale", 1.7)))

    def _bbox_loss(self, cls_score, bbox_pred, roi_boxes, roi_labels,
                   roi_deltas, pos_w, samp_w, gt_idx
                   ) -> Dict[str, jnp.ndarray]:
        bucket_cls, bucket_off = bbox_pred
        nc = self.num_classes
        loss_cls_fn = LOSSES.build(dict(self._sabl_cfg.get(
            "loss_cls", dict(type="CrossEntropyLoss"))))
        labels_flat = roi_labels.reshape(-1)
        samp_flat = samp_w.reshape(-1)
        pos_flat = pos_w.reshape(-1)
        num_sampled = jnp.maximum(samp_flat.sum(), 1.0)
        loss_cls = loss_cls_fn(cls_score, labels_flat, weight=samp_flat,
                               avg_factor=num_sampled)

        means, stds = self._coder_params()
        boxes_flat = roi_boxes.reshape(-1, 4)
        matched_gt = delta2bbox(boxes_flat, roi_deltas.reshape(-1, 4),
                                means, stds)
        offs, off_w, blabels, bcls_w = bbox2bucket(
            boxes_flat, matched_gt, self._num_buckets, self._scale_factor)
        side4 = offs.shape[-1]
        # side-bucket classification: BCE per bucket with ignore weights
        bl = bucket_cls
        bce = (jnp.maximum(bl, 0) - bl * blabels
               + jnp.log1p(jnp.exp(-jnp.abs(bl))))
        w_cls = bcls_w * pos_flat[:, None]
        loss_bucket_cls = (bce * w_cls).sum() / jnp.maximum(
            (pos_flat.sum() * 4), 1.0)
        # in-bucket offset regression: SmoothL1 beta=0.1
        beta = 0.1
        diff = jnp.abs(bucket_off - offs)
        sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                        diff - 0.5 * beta)
        w_off = off_w * pos_flat[:, None]
        loss_bucket_reg = (sl1 * w_off).sum() / jnp.maximum(
            (pos_flat.sum() * 4), 1.0)
        acc = (jnp.argmax(cls_score, -1) == labels_flat).astype(jnp.float32)
        acc = (acc * samp_flat).sum() / num_sampled * 100
        return {"loss_cls": loss_cls, "loss_bbox_cls": loss_bucket_cls,
                "loss_bbox_reg": loss_bucket_reg, "acc": acc,
                "num_pos": pos_flat.sum()}

    def simple_test(self, feats, proposals, prop_valid, img_shapes,
                    scale_factors=None, rescale: bool = False):
        cfg = dict(self.test_cfg or {})
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg.get("nms", {}).get("iou_threshold", 0.5))
        max_per_img = int(cfg.get("max_per_img", 100))
        nc = self.num_classes
        b, p = proposals.shape[:2]
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), p)[:, None]
        rois = jnp.concatenate([bidx, proposals.reshape(b * p, 4)], 1)
        roi_feats = self._extract(feats, rois)
        cls_score, (bucket_cls, bucket_off) = self.bbox_head_m(roi_feats)
        boxes, conf = bucket2bbox(rois[:, 1:5], bucket_cls, bucket_off,
                                  self._num_buckets, self._scale_factor)
        scores = jax.nn.softmax(cls_score, -1) * conf[:, None]
        scores = scores.reshape(b, p, nc + 1)
        boxes = boxes.reshape(b, p, 4)

        def single(bx, sc, pv, img_shape, scale_factor):
            bx = jnp.stack([
                jnp.clip(bx[..., 0], 0, img_shape[1]),
                jnp.clip(bx[..., 1], 0, img_shape[0]),
                jnp.clip(bx[..., 2], 0, img_shape[1]),
                jnp.clip(bx[..., 3], 0, img_shape[0])], -1)
            if rescale and scale_factor is not None:
                bx = bx / scale_factor
            bx_nc = jnp.broadcast_to(bx[:, None, :], (p, nc, 4))
            return multiclass_nms(bx_nc.reshape(p, nc * 4), sc, score_thr,
                                  iou_thr, max_per_img, valid_mask=pv)

        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        return jax.vmap(single)(boxes, scores, prop_valid, img_shapes, sf)
