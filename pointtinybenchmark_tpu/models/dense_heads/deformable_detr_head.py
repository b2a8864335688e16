"""Deformable DETR head.

Parity target: mmdet models/dense_heads/deformable_detr_head.py +
mmcv MultiScaleDeformableAttention — multi-scale feature memory
(ChannelMapper levels), encoder whose self-attention is deformable
sampling over the level pyramid, 300 object queries with per-layer
box refinement around sigmoid reference points, sigmoid-focal
classification (no background class), Hungarian matching with a focal
cost. (two_stage / iterative_bbox_refine variants not ported.)

TPU design: the CUDA MSDeformAttn kernel becomes a batched bilinear
gather — heads fold into the batch axis so one `point_sample_pixel`
call per level samples every (query, head, point) location; XLA fuses
the attention-weighted reduction. Matching is the in-graph auction
(no host callback on axon).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.bbox import cxcywh2xyxy
from ...core.post_processing import DetResult
from ...ops.grid_sample import point_sample_pixel
from ...ops.iou import bbox_overlaps, bbox_overlaps_aligned
from ...utils.registry import HEADS
from ..utils_transformer import FFN, sine_positional_encoding
from .detr_head import DETRHead
from ...core.assigners import topk_auction_match

__all__ = ["DeformableDETRHead", "MSDeformAttention", "focal_set_loss"]


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class MSDeformAttention(nn.Module):
    """Multi-scale deformable attention as bilinear gathers."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, ref_points, value_levels):
        """query (B, Q, D); ref_points (B, Q, 2) normalized cx,cy;
        value_levels: list of (B, h, w, D) per level."""
        b, q, d = query.shape
        h_, lv, p = self.num_heads, self.num_levels, self.num_points
        dh = d // h_
        off = nn.Dense(h_ * lv * p * 2, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       name="sampling_offsets")(query)
        off = off.reshape(b, q, h_, lv, p, 2)
        attn = nn.Dense(h_ * lv * p, dtype=self.dtype,
                        name="attention_weights")(query)
        attn = jax.nn.softmax(attn.reshape(b, q, h_, lv * p), -1)
        attn = attn.reshape(b, q, h_, lv, p)

        out = jnp.zeros((b, q, h_, dh), self.dtype)
        for li, v in enumerate(value_levels[:lv]):
            vh, vw = v.shape[1:3]
            val = nn.Dense(d, dtype=self.dtype, name=f"value_proj{li}")(v)
            # heads fold into batch: (B*H, h, w, Dh)
            val = val.reshape(b, vh, vw, h_, dh).transpose(0, 3, 1, 2, 4)
            val = val.reshape(b * h_, vh, vw, dh)
            wh = jnp.asarray([vw, vh], self.dtype)
            # pixel-space sampling points (B, Q, H, P, 2)
            pts = ref_points[:, :, None, None, :] * wh \
                + off[:, :, :, li]            # offsets in level cells
            pts = pts.transpose(0, 2, 1, 3, 4).reshape(b * h_, q * p, 2)
            sampled = point_sample_pixel(val, pts, padding_mode="zeros")
            sampled = sampled.reshape(b, h_, q, p, dh)
            w = attn[:, :, :, li].transpose(0, 2, 1, 3)     # (B, H, Q, P)
            out = out + (sampled * w[..., None]).sum(3).transpose(0, 2, 1, 3)
        out = out.reshape(b, q, d)
        return nn.Dense(d, dtype=self.dtype, name="output_proj")(out)


class DeformableEncoderLayer(nn.Module):
    embed_dims: int
    num_heads: int
    num_levels: int
    num_points: int
    ffn_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos, ref_points, spatial_shapes):
        levels = []
        start = 0
        for (h, w) in spatial_shapes:
            levels.append(x[:, start:start + h * w].reshape(
                x.shape[0], h, w, -1))
            start += h * w
        y = MSDeformAttention(self.embed_dims, self.num_heads,
                              self.num_levels, self.num_points,
                              dtype=self.dtype, name="attn")(
            x + pos, ref_points, levels)
        x = nn.LayerNorm(dtype=self.dtype)(x + y)
        y = FFN(self.embed_dims, self.ffn_dim, dtype=self.dtype)(x)
        return nn.LayerNorm(dtype=self.dtype)(x + y)


class DeformableDecoderLayer(nn.Module):
    embed_dims: int
    num_heads: int
    num_levels: int
    num_points: int
    ffn_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, qpos, mem, ref_points, spatial_shapes):
        q = tgt + qpos
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            name="self_attn")(q, q, tgt)
        tgt = nn.LayerNorm(dtype=self.dtype)(tgt + y)
        levels = []
        start = 0
        for (h, w) in spatial_shapes:
            levels.append(mem[:, start:start + h * w].reshape(
                mem.shape[0], h, w, -1))
            start += h * w
        y = MSDeformAttention(self.embed_dims, self.num_heads,
                              self.num_levels, self.num_points,
                              dtype=self.dtype, name="cross_attn")(
            tgt + qpos, ref_points, levels)
        tgt = nn.LayerNorm(dtype=self.dtype)(tgt + y)
        y = FFN(self.embed_dims, self.ffn_dim, dtype=self.dtype)(tgt)
        return nn.LayerNorm(dtype=self.dtype)(tgt + y)


@HEADS.register_module()
class DeformableDETRHead(DETRHead):
    """Multi-level input (use a ChannelMapper neck); sigmoid-focal cls."""
    num_query: int = 300
    num_levels: int = 4
    num_points: int = 4
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False,
                 img_shapes: Optional[jnp.ndarray] = None):
        feats = list(feats)[-self.num_levels:]
        b = feats[0].shape[0]
        spatial_shapes = [f.shape[1:3] for f in feats]
        toks, poss, refs = [], [], []
        lvl_embed = self.param("level_embed", nn.initializers.normal(1.0),
                               (len(feats), self.embed_dims))
        for li, f in enumerate(feats):
            h, w = f.shape[1:3]
            x = nn.Conv(self.embed_dims, (1, 1), dtype=self.dtype,
                        name=f"input_proj{li}")(f)
            mask = jnp.ones((b, h, w), bool)
            pos = sine_positional_encoding(mask, self.embed_dims // 2)
            toks.append(x.reshape(b, h * w, self.embed_dims))
            poss.append(pos.reshape(b, h * w, self.embed_dims)
                        .astype(self.dtype) + lvl_embed[li][None, None])
            yy, xx = jnp.meshgrid(jnp.arange(h) + 0.5, jnp.arange(w) + 0.5,
                                  indexing="ij")
            refs.append(jnp.stack([xx.ravel() / w, yy.ravel() / h], -1))
        mem = jnp.concatenate(toks, 1)
        pos_flat = jnp.concatenate(poss, 1)
        enc_ref = jnp.broadcast_to(jnp.concatenate(refs, 0)[None],
                                   (b, mem.shape[1], 2)).astype(self.dtype)

        for i in range(self.num_encoder_layers):
            mem = DeformableEncoderLayer(
                self.embed_dims, self.num_heads, len(feats),
                self.num_points, self.ffn_dim, dtype=self.dtype,
                name=f"enc{i}")(mem, pos_flat, enc_ref, spatial_shapes)

        query_embed = self.param("query_embed",
                                 nn.initializers.normal(1.0),
                                 (self.num_query, self.embed_dims * 2))
        qpos = jnp.broadcast_to(query_embed[None, :, :self.embed_dims],
                                (b, self.num_query, self.embed_dims)
                                ).astype(self.dtype)
        tgt = jnp.broadcast_to(query_embed[None, :, self.embed_dims:],
                               (b, self.num_query, self.embed_dims)
                               ).astype(self.dtype)
        ref = jax.nn.sigmoid(nn.Dense(2, dtype=self.dtype,
                                      name="ref_point_fc")(qpos))

        fc_cls = nn.Dense(self.num_classes, dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.6),
                          name="fc_cls")
        reg_l1 = nn.Dense(self.embed_dims, dtype=self.dtype, name="reg_l1")
        reg_l2 = nn.Dense(self.embed_dims, dtype=self.dtype, name="reg_l2")
        reg_out = nn.Dense(4, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros,
                           name="reg_out")

        all_cls, all_bbox = [], []
        for i in range(self.num_decoder_layers):
            tgt = DeformableDecoderLayer(
                self.embed_dims, self.num_heads, len(feats),
                self.num_points, self.ffn_dim, dtype=self.dtype,
                name=f"dec{i}")(tgt, qpos, mem, ref, spatial_shapes)
            out = nn.LayerNorm(dtype=self.dtype, name=f"post_norm{i}")(tgt)
            all_cls.append(fc_cls(out))
            d = reg_out(nn.relu(reg_l2(nn.relu(reg_l1(out)))))
            # refine around the reference point (center only; wh free)
            cxcy = jax.nn.sigmoid(d[..., :2] + inverse_sigmoid(ref))
            wh = jax.nn.sigmoid(d[..., 2:])
            all_bbox.append(jnp.concatenate([cxcy, wh], -1))
        return jnp.stack(all_cls), jnp.stack(all_bbox)

    # sigmoid-focal variant of the DETR set loss
    def _loss_single(self, cls_logits, bbox_pred, gt_bboxes, gt_labels,
                     gt_valid, img_shape, pad_shape):
        return focal_set_loss(
            cls_logits, bbox_pred, gt_bboxes, gt_labels, gt_valid,
            pad_shape, self.num_classes,
            focal_alpha=self.focal_alpha, focal_gamma=self.focal_gamma,
            cost_cls_weight=self.cost_cls_weight,
            cost_bbox_weight=self.cost_bbox_weight,
            cost_iou_weight=self.cost_iou_weight,
            loss_cls_weight=self.loss_cls_weight,
            loss_bbox_weight=self.loss_bbox_weight,
            loss_iou_weight=self.loss_iou_weight)


    def get_bboxes(self, all_cls, all_bbox, img_shapes, pad_shape,
                   scale_factors=None, rescale: bool = False) -> DetResult:
        cfg = self.test_cfg or {}
        max_per_img = int(cfg.get("max_per_img", 100))
        cls_logits = all_cls[-1]
        bbox_pred = all_bbox[-1]
        b = cls_logits.shape[0]
        factor = jnp.asarray([pad_shape[1], pad_shape[0],
                              pad_shape[1], pad_shape[0]], jnp.float32)

        def single(logits, boxes_n, img_shape, scale_factor):
            probs = jax.nn.sigmoid(logits)                    # (Q, C)
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


def focal_set_loss(cls_logits, bbox_pred, gt_bboxes, gt_labels,
               gt_valid, pad_shape, num_classes,
               focal_alpha=0.25, focal_gamma=2.0,
               cost_cls_weight=1.0, cost_bbox_weight=5.0,
               cost_iou_weight=2.0, loss_cls_weight=1.0,
               loss_bbox_weight=5.0, loss_iou_weight=2.0):
    """One-to-one focal set loss shared by DeformableDETR and SparseRCNN.

    bbox_pred: (B, Q, 4) normalized cxcywh; gt in absolute xyxy."""
    b, q = cls_logits.shape[:2]
    g = gt_bboxes.shape[1]
    factor = jnp.asarray([pad_shape[1], pad_shape[0],
                          pad_shape[1], pad_shape[0]], jnp.float32)
    gt_xyxy_n = gt_bboxes / factor
    gt_cxcywh = jnp.stack([
        (gt_xyxy_n[..., 0] + gt_xyxy_n[..., 2]) / 2,
        (gt_xyxy_n[..., 1] + gt_xyxy_n[..., 3]) / 2,
        gt_xyxy_n[..., 2] - gt_xyxy_n[..., 0],
        gt_xyxy_n[..., 3] - gt_xyxy_n[..., 1]], -1)
    pred_xyxy = cxcywh2xyxy(bbox_pred)

    probs = jax.nn.sigmoid(cls_logits)                    # (B, Q, C)
    safe_lbl = jnp.clip(gt_labels, 0, num_classes - 1)
    p_gt = jnp.take_along_axis(
        probs, safe_lbl[:, None, :].repeat(q, 1), -1)     # (B, Q, G)
    a, gma = focal_alpha, focal_gamma
    pos_cost = -a * (1 - p_gt) ** gma * jnp.log(p_gt + 1e-8)
    neg_cost = -(1 - a) * p_gt ** gma * jnp.log(1 - p_gt + 1e-8)
    cls_cost = pos_cost - neg_cost
    bbox_cost = jnp.sum(jnp.abs(bbox_pred[:, :, None, :]
                                - gt_cxcywh[:, None, :, :]), -1)
    iou_cost = -jax.vmap(bbox_overlaps, in_axes=(0, 0, None))(
        pred_xyxy, gt_xyxy_n, "giou")
    cost = (cost_cls_weight * cls_cost
            + cost_bbox_weight * bbox_cost
            + cost_iou_weight * iou_cost)
    cost = jnp.where(gt_valid[:, None, :], cost, 1e8)
    assigned = topk_auction_match(cost, gt_valid, topk_k=1)

    pos = assigned > 0
    safe = jnp.clip(assigned - 1, 0, g - 1)
    labels = jnp.where(pos, jnp.take_along_axis(gt_labels, safe, 1),
                       num_classes)
    tgt_boxes = jnp.take_along_axis(gt_cxcywh, safe[..., None], 1)
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    onehot = jax.nn.one_hot(labels, num_classes)     # bg -> zeros
    pt = probs * onehot + (1 - probs) * (1 - onehot)
    alpha_t = a * onehot + (1 - a) * (1 - onehot)
    bce = -(onehot * jnp.log(probs + 1e-8)
            + (1 - onehot) * jnp.log(1 - probs + 1e-8))
    loss_cls = (loss_cls_weight
                * (alpha_t * (1 - pt) ** gma * bce).sum() / num_pos)

    pos_f = pos.astype(jnp.float32)[..., None]
    loss_bbox = (loss_bbox_weight
                 * (jnp.abs(bbox_pred - tgt_boxes) * pos_f).sum()
                 / num_pos)
    gious = bbox_overlaps_aligned(pred_xyxy,
                                  cxcywh2xyxy(tgt_boxes), mode="giou")
    loss_iou = (loss_iou_weight
                * ((1 - gious) * pos_f[..., 0]).sum() / num_pos)
    return dict(cls=loss_cls, bbox=loss_bbox, iou=loss_iou,
                num_pos=num_pos)
