"""DETRHead — end-to-end set prediction with transformers.

Parity target: mmdet models/dense_heads/detr_head.py — C5 feature projected
to d_model, sine positional encoding, 6-layer encoder/decoder, 100 object
queries, set-based Hungarian matching (here: the in-graph auction with
topk_k=1 — DETR's one-to-one regime is exactly what the matcher was built
for), CE (bg weight 0.1) + L1 + GIoU losses with per-decoder-layer
auxiliaries; NMS-free inference.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.assigners import topk_auction_match
from ...core.bbox import cxcywh2xyxy
from ...core.post_processing import DetResult
from ...ops.iou import bbox_overlaps, bbox_overlaps_aligned
from ...utils.registry import HEADS, LOSSES
from ..utils_transformer import (TransformerDecoderLayer,
                                 TransformerEncoderLayer,
                                 sine_positional_encoding)

__all__ = ["DETRHead"]


@HEADS.register_module()
class DETRHead(nn.Module):
    num_classes: int
    in_channels: int
    num_query: int = 100
    embed_dims: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    ffn_dim: int = 2048
    bg_cls_weight: float = 0.1
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 5.0
    loss_iou_weight: float = 2.0
    cost_cls_weight: float = 1.0
    cost_bbox_weight: float = 5.0
    cost_iou_weight: float = 2.0
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False,
                 img_shapes: Optional[jnp.ndarray] = None):
        """Uses the last feature level. Returns (all_cls (L, B, Q, C+1),
        all_bbox (L, B, Q, 4) normalized cxcywh)."""
        x = feats[-1]
        b, h, w, _ = x.shape
        x = nn.Conv(self.embed_dims, (1, 1), dtype=self.dtype,
                    name="input_proj")(x)
        if img_shapes is not None:
            # valid-feature mask: each image occupies the top-left
            # img_shape / pad_shape fraction of the padded frame (the batch
            # max is the pad frame up to divisor rounding).
            ys = jnp.arange(h)[None, :, None]
            xs = jnp.arange(w)[None, None, :]
            img_h = img_shapes[:, 0].astype(jnp.float32)
            img_w = img_shapes[:, 1].astype(jnp.float32)
            pad_h = jnp.maximum(jnp.max(img_h), 1.0)
            pad_w = jnp.maximum(jnp.max(img_w), 1.0)
            mask = ((ys < jnp.ceil(h * img_h[:, None, None] / pad_h))
                    & (xs < jnp.ceil(w * img_w[:, None, None] / pad_w)))
        else:
            mask = jnp.ones((b, h, w), bool)
        pos = sine_positional_encoding(mask, self.embed_dims // 2)
        pos = pos.astype(self.dtype)

        mem = x.reshape(b, h * w, self.embed_dims)
        pos_flat = pos.reshape(b, h * w, self.embed_dims)
        key_mask = mask.reshape(b, h * w)
        for i in range(self.num_encoder_layers):
            mem = TransformerEncoderLayer(
                self.embed_dims, self.num_heads, self.ffn_dim,
                dtype=self.dtype, name=f"enc{i}")(mem, pos_flat, key_mask)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_query, self.embed_dims))
        qpos = jnp.broadcast_to(query_embed[None],
                                (b, self.num_query, self.embed_dims))
        tgt = jnp.zeros((b, self.num_query, self.embed_dims), self.dtype)
        fc_cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          name="fc_cls")
        reg_l1 = nn.Dense(self.embed_dims, dtype=self.dtype, name="reg_l1")
        reg_l2 = nn.Dense(self.embed_dims, dtype=self.dtype, name="reg_l2")
        reg_out = nn.Dense(4, dtype=self.dtype, name="reg_out")

        all_cls, all_bbox = [], []
        for i in range(self.num_decoder_layers):
            tgt = TransformerDecoderLayer(
                self.embed_dims, self.num_heads, self.ffn_dim,
                dtype=self.dtype, name=f"dec{i}")(tgt, qpos, mem, pos_flat,
                                                  key_mask)
            out = nn.LayerNorm(dtype=self.dtype, name=f"post_norm{i}")(tgt)
            all_cls.append(fc_cls(out))
            reg = nn.relu(reg_l1(out))
            reg = nn.relu(reg_l2(reg))
            all_bbox.append(jax.nn.sigmoid(reg_out(reg)))
        return jnp.stack(all_cls), jnp.stack(all_bbox)

    # ---------------------------------------------------------------- loss
    def loss(self, all_cls, all_bbox, batch: Dict[str, Any],
             rng=None) -> Dict[str, jnp.ndarray]:
        gt_bboxes = batch["gt_bboxes"]
        gt_labels = batch["gt_labels"]
        gt_valid = batch["gt_valid"]
        img_shape = batch["img_shape"].astype(jnp.float32)  # (B, 2) h,w
        pad_h, pad_w = batch["pad_shape"][0], batch["pad_shape"][1]
        losses: Dict[str, jnp.ndarray] = {}
        num_layers = all_cls.shape[0]
        total_pos = None
        for li in range(num_layers):
            l = self._loss_single(all_cls[li], all_bbox[li], gt_bboxes,
                                  gt_labels, gt_valid, img_shape,
                                  (pad_h, pad_w))
            prefix = "" if li == num_layers - 1 else f"d{li}."
            for k, v in l.items():
                if k == "num_pos":
                    total_pos = v
                    continue
                losses[f"loss_{prefix}{k}"] = v
        losses["num_pos"] = total_pos
        return losses

    def _loss_single(self, cls_logits, bbox_pred, gt_bboxes, gt_labels,
                     gt_valid, img_shape, pad_shape):
        b, q = cls_logits.shape[:2]
        g = gt_bboxes.shape[1]
        # normalized gt cxcywh (by the padded frame, matching pred range)
        factor = jnp.asarray([pad_shape[1], pad_shape[0],
                              pad_shape[1], pad_shape[0]], jnp.float32)
        gt_xyxy_n = gt_bboxes / factor
        gt_cxcywh = jnp.stack([
            (gt_xyxy_n[..., 0] + gt_xyxy_n[..., 2]) / 2,
            (gt_xyxy_n[..., 1] + gt_xyxy_n[..., 3]) / 2,
            gt_xyxy_n[..., 2] - gt_xyxy_n[..., 0],
            gt_xyxy_n[..., 3] - gt_xyxy_n[..., 1]], -1)
        pred_xyxy = cxcywh2xyxy(bbox_pred)

        # matching costs (softmax cls prob, L1 on cxcywh, -GIoU)
        probs = jax.nn.softmax(cls_logits, -1)        # (B, Q, C+1)
        safe_lbl = jnp.clip(gt_labels, 0, self.num_classes - 1)
        cls_cost = -jnp.take_along_axis(
            probs, safe_lbl[:, None, :].repeat(q, 1), -1)  # (B, Q, G)
        bbox_cost = jnp.sum(jnp.abs(bbox_pred[:, :, None, :]
                                    - gt_cxcywh[:, None, :, :]), -1)
        iou_cost = -jax.vmap(bbox_overlaps, in_axes=(0, 0, None))(
            pred_xyxy, gt_xyxy_n, "giou")
        cost = (self.cost_cls_weight * cls_cost
                + self.cost_bbox_weight * bbox_cost
                + self.cost_iou_weight * iou_cost)
        cost = jnp.where(gt_valid[:, None, :], cost, 1e8)
        assigned = topk_auction_match(cost, gt_valid, topk_k=1)   # (B, Q)

        pos = assigned > 0
        safe = jnp.clip(assigned - 1, 0, g - 1)
        labels = jnp.where(pos, jnp.take_along_axis(gt_labels, safe, 1),
                           self.num_classes)
        tgt_boxes = jnp.take_along_axis(gt_cxcywh, safe[..., None], 1)
        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

        # CE with background down-weight
        logp = jax.nn.log_softmax(cls_logits, -1)
        ce = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        cls_w = jnp.where(pos, 1.0, self.bg_cls_weight)
        loss_cls = (self.loss_cls_weight * (ce * cls_w).sum()
                    / jnp.maximum(cls_w.sum(), 1.0))

        pos_f = pos.astype(jnp.float32)[..., None]
        loss_bbox = (self.loss_bbox_weight
                     * (jnp.abs(bbox_pred - tgt_boxes) * pos_f).sum()
                     / num_pos)
        gious = bbox_overlaps_aligned(pred_xyxy,
                                      cxcywh2xyxy(tgt_boxes), mode="giou")
        loss_iou = (self.loss_iou_weight
                    * ((1 - gious) * pos_f[..., 0]).sum() / num_pos)
        return dict(cls=loss_cls, bbox=loss_bbox, iou=loss_iou,
                    num_pos=num_pos)

    # ------------------------------------------------------------ inference
    def get_bboxes(self, all_cls, all_bbox, img_shapes, pad_shape,
                   scale_factors=None, rescale: bool = False) -> DetResult:
        cfg = self.test_cfg or {}
        max_per_img = int(cfg.get("max_per_img", 100))
        cls_logits = all_cls[-1]
        bbox_pred = all_bbox[-1]
        b, q = cls_logits.shape[:2]
        factor = jnp.asarray([pad_shape[1], pad_shape[0],
                              pad_shape[1], pad_shape[0]], jnp.float32)

        def single(logits, boxes_n, img_shape, scale_factor):
            probs = jax.nn.softmax(logits, -1)[:, :-1]      # drop bg
            flat = probs.reshape(-1)
            k = min(max_per_img, flat.shape[0])
            top_sc, idx = jax.lax.top_k(flat, k)
            qi = idx // self.num_classes
            ci = idx % self.num_classes
            boxes = cxcywh2xyxy(boxes_n[qi]) * factor
            boxes = jnp.stack([
                jnp.clip(boxes[:, 0], 0, img_shape[1]),
                jnp.clip(boxes[:, 1], 0, img_shape[0]),
                jnp.clip(boxes[:, 2], 0, img_shape[1]),
                jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
            if rescale and scale_factor is not None:
                boxes = boxes / scale_factor
            dets = jnp.concatenate([boxes, top_sc[:, None]], -1)
            if k < max_per_img:
                padn = max_per_img - k
                dets = jnp.concatenate(
                    [dets, jnp.zeros((padn, 5), dets.dtype)])
                ci = jnp.concatenate([ci, jnp.full((padn,), -1, ci.dtype)])
                top_sc = jnp.concatenate([top_sc, jnp.zeros((padn,))])
            valid = top_sc > float(cfg.get("score_thr", 0.0))
            return DetResult(dets, ci.astype(jnp.int32), valid)

        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        dets = jax.vmap(single)(cls_logits, bbox_pred, img_shapes, sf)
        return dets, None
