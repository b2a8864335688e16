"""Mask Scoring R-CNN (arXiv 1903.00241).

Parity targets: mmdet models/roi_heads/mask_scoring_roi_head.py and
mask_heads/maskiou_head.py:12 — a MaskIoU head (convs over mask features
concatenated with the max-pooled mask prediction, then FCs) regresses the
IoU of the predicted binary mask against the full gt instance mask; at test
time mask_score = cls_score * mask_iou.

TPU notes on the IoU target (maskiou_head.get_targets :97): the gt full-
instance area is recovered from the RoI-cropped 28x28 target via the area
ratio; here the ratio is computed directly on the (B, G, H, W) device
bitmaps (mean(target) * roi_area / full_gt_area) instead of the reference's
per-proposal host crop loop.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import HEADS
from .standard_roi_head import StandardRoIHead

__all__ = ["MaskIoUHead", "MaskScoringRoIHead"]


@HEADS.register_module()
class MaskIoUHead(nn.Module):
    num_classes: int = 80
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mask_feat: jnp.ndarray,
                 mask_pred_sigmoid: jnp.ndarray) -> jnp.ndarray:
        """mask_feat (N, m, m, C) + predicted class mask (N, 2m?, 2m?) or
        (N, m, m) probabilities -> (N, num_classes) IoU estimates."""
        mp = mask_pred_sigmoid
        if mp.shape[1] != mask_feat.shape[1]:
            k = mp.shape[1] // mask_feat.shape[1]
            mp = nn.max_pool(mp[..., None], (k, k), strides=(k, k))[..., 0]
        x = jnp.concatenate([mask_feat, mp[..., None]], -1)
        for i in range(self.num_convs):
            stride = 2 if i == self.num_convs - 1 else 1
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3),
                                strides=(stride, stride), padding=1,
                                dtype=self.dtype, name=f"conv{i}")(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 name=f"fc{i}")(x))
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="fc_mask_iou")(x)


@HEADS.register_module()
class MaskScoringRoIHead(StandardRoIHead):
    mask_iou_head: Optional[dict] = None

    def setup(self):
        super().setup()
        cfg = dict(self.mask_iou_head or {})
        cfg.pop("type", None)
        cfg.setdefault("num_classes", self.num_classes)
        self.mask_iou_head_m = MaskIoUHead(**cfg)

    def _mask_extras(self, out, mask_feats, mask_logits, logits_cls,
                     targets, rois, labels_flat, pos_flat, gt_idx,
                     batch) -> None:
        mask_thr = float((self.train_cfg or {}).get("mask_thr_binary", 0.5))
        probs = jax.nn.sigmoid(logits_cls)                  # (N, m, m)
        iou_pred = self.mask_iou_head_m(mask_feats, probs)  # (N, nc)
        safe_lbl = jnp.clip(labels_flat, 0, self.num_classes - 1)
        iou_pred_cls = jnp.take_along_axis(iou_pred, safe_lbl[:, None],
                                           -1)[:, 0]

        # --- IoU targets (maskiou_head.get_targets :97-144)
        msz = targets.shape[1]
        bin_pred = (probs > mask_thr).astype(jnp.float32)
        pred_area = bin_pred.sum((1, 2))
        overlap = (bin_pred * targets).sum((1, 2))
        # gt full area in 28x28 units: target_area / ratio, with
        # ratio = gt-area-inside-roi / full gt area (image pixels)
        gm = batch["gt_masks"].astype(jnp.float32)          # (B, G, H, W)
        full_area = gm.sum((2, 3))                          # (B, G)
        b, g = full_area.shape
        s = labels_flat.shape[0] // b
        img_idx = jnp.repeat(jnp.arange(b), s)
        full_sel = full_area[img_idx, gt_idx.reshape(-1)]   # (N,)
        roi_w = jnp.maximum(rois[:, 3] - rois[:, 1], 1.0)
        roi_h = jnp.maximum(rois[:, 4] - rois[:, 2], 1.0)
        in_box_px = targets.mean((1, 2)) * roi_w * roi_h
        ratio = in_box_px / jnp.maximum(full_sel, 1e-7)
        gt_full_units = targets.sum((1, 2)) / jnp.maximum(ratio, 1e-7)
        iou_tgt = overlap / jnp.maximum(
            pred_area + gt_full_units - overlap, 1e-7)
        iou_tgt = jnp.where(pos_flat > 0, iou_tgt, 0.0)

        valid = (iou_tgt > 0).astype(jnp.float32)
        n_valid = jnp.maximum(valid.sum(), 1.0)
        # reference loss_iou: MSELoss(loss_weight=0.5)
        out["loss_mask_iou"] = (0.5 * ((iou_pred_cls - iou_tgt) ** 2)
                                * valid).sum() / n_valid

    def simple_test(self, feats, proposals, prop_valid, img_shapes,
                    scale_factors=None, rescale: bool = False):
        """Standard test, then rescore the mask channel:
        mask_score = cls_score * predicted mask IoU
        (maskiou_head.get_mask_scores :173). Returned as dets with the
        rescored confidence in bboxes[..., 4] of the mask output pair."""
        out = super().simple_test(feats, proposals, prop_valid, img_shapes,
                                  scale_factors, rescale)
        if self.mask_head_m is None:
            # still touch the IoU head so init creates its params
            dummy_feat = jnp.zeros((1, 7, 7, 1), jnp.float32)
            self.mask_iou_head_m(dummy_feat, jnp.zeros((1, 7, 7)))
            return out
        dets, masks = out
        b, m = masks.shape[:2]
        det_boxes = dets.bboxes[..., :4]
        if rescale and scale_factors is not None:
            det_boxes = det_boxes * scale_factors[:, None, :]
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), m)[:, None]
        mask_rois = jnp.concatenate(
            [batch_idx, det_boxes.reshape(b * m, 4)], 1)
        mask_feats = self._extract_mask(feats, mask_rois)
        msz = masks.shape[2]
        iou_pred = self.mask_iou_head_m(
            mask_feats, masks.reshape(b * m, msz, msz))
        safe_lbl = jnp.clip(dets.labels.reshape(-1), 0, self.num_classes - 1)
        iou_cls = jnp.take_along_axis(iou_pred, safe_lbl[:, None],
                                      -1)[:, 0].reshape(b, m)
        mask_scores = dets.bboxes[..., 4] * iou_cls
        return dets, masks, mask_scores
