"""GFLHead — Generalized Focal Loss head (NeurIPS2020).

Parity target: mmdet models/dense_heads/gfl_head.py — ATSS assignment,
classification supervised by IoU quality (QFL), box sides regressed as
discrete distributions over reg_max+1 bins decoded by their expectation
(Integral), trained with DFL + GIoU.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.bbox import bbox2distance, distance2bbox
from ...ops.iou import bbox_overlaps_aligned
from ...utils.registry import HEADS, LOSSES
from ...ops.gather import take_rows
from ..utils import ConvModule, bias_init_with_prob
from .anchor_head import AnchorHead
from .atss_head import atss_assign
from .fcos_head import Scale

__all__ = ["GFLHead"]


@HEADS.register_module()
class GFLHead(AnchorHead):
    stacked_convs: int = 4
    reg_max: int = 16
    norm_cfg: Optional[dict] = None
    loss_dfl: Optional[dict] = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        norm = (self.norm_cfg or {"type": "GN"}).get("type")
        ngroups = (self.norm_cfg or {}).get("num_groups", 32)
        cls_convs = [ConvModule(self.feat_channels, 3, norm=norm,
                                num_groups=ngroups, dtype=self.dtype,
                                name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [ConvModule(self.feat_channels, 3, norm=norm,
                                num_groups=ngroups, dtype=self.dtype,
                                name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        gfl_cls = nn.Conv(self.cls_out_channels, (3, 3), padding=1,
                          dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          bias_init=nn.initializers.constant(
                              bias_init_with_prob(0.01)), name="gfl_cls")
        gfl_reg = nn.Conv(4 * (self.reg_max + 1), (3, 3), padding=1,
                          kernel_init=nn.initializers.normal(0.01),
                          dtype=self.dtype, name="gfl_reg")
        gen = self._build_generator()
        scales = [Scale(name=f"scale{i}") for i in range(len(gen.strides))]
        cls_outs, reg_outs = [], []
        for i, f in enumerate(feats):
            cf, rf = f, f
            for conv in cls_convs:
                cf = conv(cf, train=train)
            for conv in reg_convs:
                rf = conv(rf, train=train)
            cls_outs.append(gfl_cls(cf))
            reg_outs.append(scales[i](gfl_reg(rf)))
        return cls_outs, reg_outs

    # -------------------------------------------------------------- decode
    def integral(self, reg_logits: jnp.ndarray) -> jnp.ndarray:
        """(..., 4*(reg_max+1)) -> (..., 4) expected side distances (in
        stride units)."""
        shape = reg_logits.shape[:-1]
        p = jax.nn.softmax(
            reg_logits.reshape(*shape, 4, self.reg_max + 1), -1)
        bins = jnp.arange(self.reg_max + 1, dtype=p.dtype)
        return (p * bins).sum(-1)

    def _anchor_centers_strides(self, featmap_sizes):
        gen = self._build_generator()
        level_anchors = [np.asarray(a) for a in gen.grid_anchors(featmap_sizes)]
        anchors = np.concatenate(level_anchors).astype(np.float32)
        centers = np.stack([(anchors[:, 0] + anchors[:, 2]) / 2,
                            (anchors[:, 1] + anchors[:, 3]) / 2], -1)
        strides = np.concatenate([
            np.full((len(a),), gen.strides[i][0], np.float32)
            for i, a in enumerate(level_anchors)])
        return anchors, centers, strides, [len(a) for a in level_anchors]

    # ---------------------------------------------------------------- loss
    def loss(self, cls_outs, reg_outs, batch: Dict[str, Any],
             rng=None) -> Dict[str, jnp.ndarray]:
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        anchors, centers, strides, level_sizes = \
            self._anchor_centers_strides(featmap_sizes)
        b = cls_outs[0].shape[0]
        cls_cat = jnp.concatenate(
            [c.reshape(b, -1, self.cls_out_channels) for c in cls_outs], 1)
        reg_cat = jnp.concatenate(
            [r.reshape(b, -1, 4 * (self.reg_max + 1)) for r in reg_outs], 1)
        n = cls_cat.shape[1]
        topk = int((self.train_cfg or {}).get("assigner", {}).get("topk", 9))

        def single(gtb, gtl, gv):
            assigned = atss_assign(anchors, level_sizes, gtb, gv, topk)
            pos = assigned > 0
            safe = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
            return pos, take_rows(gtb, safe), jnp.where(
                pos, take_rows(gtl, safe), self.num_classes)

        pos, tgt_boxes, labels = jax.vmap(single)(
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"])
        pos_f = pos.astype(jnp.float32)
        num_pos = jnp.maximum(pos_f.sum(), 1.0)

        centers_b = jnp.asarray(centers)[None]
        strides_b = jnp.asarray(strides)[None, :, None]
        dist_pred = self.integral(reg_cat) * strides_b[..., 0][..., None]
        decoded = distance2bbox(jnp.broadcast_to(centers_b, (b, n, 2)),
                                dist_pred)
        quality = bbox_overlaps_aligned(
            jax.lax.stop_gradient(decoded), tgt_boxes)
        quality = jnp.where(pos, quality, 0.0)

        qfl = LOSSES.build(dict(
            self.loss_cls or dict(type="QualityFocalLoss", use_sigmoid=True,
                                  beta=2.0, loss_weight=1.0)))
        loss_cls = qfl(cls_cat.reshape(b * n, -1),
                       (labels.reshape(-1), quality.reshape(-1)),
                       avg_factor=num_pos)

        giou = LOSSES.build(dict(
            self.loss_bbox or dict(type="GIoULoss", loss_weight=2.0)))
        w = jnp.where(pos, quality, 0.0)
        denom = jnp.maximum(w.sum(), 1e-6)
        loss_bbox = giou(decoded.reshape(-1, 4), tgt_boxes.reshape(-1, 4),
                         weight=w.reshape(-1), avg_factor=denom)

        dfl = LOSSES.build(dict(
            self.loss_dfl or dict(type="DistributionFocalLoss",
                                  loss_weight=0.25)))
        tgt_dist = bbox2distance(jnp.broadcast_to(centers_b, (b, n, 2)),
                                 tgt_boxes, max_dis=self.reg_max) \
            / strides_b
        tgt_dist = jnp.clip(tgt_dist, 0, self.reg_max - 0.01)
        loss_dfl = dfl(
            reg_cat.reshape(b * n * 4, self.reg_max + 1),
            tgt_dist.reshape(-1),
            weight=jnp.repeat(w.reshape(-1), 4),
            avg_factor=denom * 4)
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "loss_dfl": loss_dfl, "num_pos": pos_f.sum()}

    # ------------------------------------------------------------ inference
    def get_bboxes(self, cls_outs, reg_outs, img_shapes, pad_shape,
                   scale_factors=None, rescale: bool = False):
        from ...core.post_processing import multiclass_nms
        cfg = self.test_cfg or {}
        nms_pre = int(cfg.get("nms_pre", 1000))
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg.get("nms", {}).get("iou_threshold", 0.6))
        max_per_img = int(cfg.get("max_per_img", 100))
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        gen = self._build_generator()
        level_anchors = [np.asarray(a) for a in gen.grid_anchors(featmap_sizes)]
        b = cls_outs[0].shape[0]

        def single(cls_list, reg_list, img_shape, scale_factor):
            boxes_all, scores_all = [], []
            for lvl in range(len(cls_list)):
                a = level_anchors[lvl]
                ctr = jnp.asarray(np.stack(
                    [(a[:, 0] + a[:, 2]) / 2, (a[:, 1] + a[:, 3]) / 2], -1))
                s = float(gen.strides[lvl][0])
                sc = jax.nn.sigmoid(cls_list[lvl])
                k = min(nms_pre, sc.shape[0]) if nms_pre > 0 else sc.shape[0]
                _, idx = jax.lax.top_k(jnp.max(sc, -1), k)
                dist = self.integral(reg_list[lvl][idx]) * s
                boxes = distance2bbox(ctr[idx], dist)
                boxes = jnp.stack([
                    jnp.clip(boxes[:, 0], 0, img_shape[1]),
                    jnp.clip(boxes[:, 1], 0, img_shape[0]),
                    jnp.clip(boxes[:, 2], 0, img_shape[1]),
                    jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
                boxes_all.append(boxes)
                scores_all.append(sc[idx])
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            if rescale and scale_factor is not None:
                boxes = boxes / scale_factor
            scores = jnp.concatenate(
                [scores, jnp.zeros((scores.shape[0], 1))], -1)
            return multiclass_nms(boxes, scores, score_thr, iou_thr,
                                  max_per_img)

        cls_levels = [c.reshape(b, -1, self.cls_out_channels)
                      for c in cls_outs]
        reg_levels = [r.reshape(b, -1, 4 * (self.reg_max + 1))
                      for r in reg_outs]
        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        dets = jax.vmap(single)(cls_levels, reg_levels, img_shapes, sf)
        return dets, None
