"""ATSSHead — Adaptive Training Sample Selection (CVPR2020).

Parity target: mmdet models/dense_heads/atss_head.py + core/bbox/assigners/
atss_assigner.py: per gt, the topk center-closest anchors per level are
candidates; the IoU threshold adapts to mean+std of candidate IoUs;
positives must also have their anchor center inside the gt. Losses: focal
cls, GIoU on decoded boxes weighted by centerness targets, BCE centerness.

TPU design: the per-gt candidate selection is one batched top-k over a
(N, G) distance matrix with per-level masking — no per-gt host loops.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.bbox import bbox2delta, delta2bbox
from ...ops.iou import bbox_overlaps
from ...utils.registry import HEADS, LOSSES
from ...ops.gather import take_rows
from ..utils import ConvModule, bias_init_with_prob
from .anchor_head import AnchorHead

__all__ = ["ATSSHead", "atss_assign"]


def atss_assign(anchors: np.ndarray, level_sizes: Sequence[int],
                gt_bboxes: jnp.ndarray, gt_valid: jnp.ndarray,
                topk: int = 9) -> jnp.ndarray:
    """Returns assigned (N,) int32: 0 bg, j+1 -> gt j."""
    n = anchors.shape[0]
    centers = np.stack([(anchors[:, 0] + anchors[:, 2]) / 2,
                        (anchors[:, 1] + anchors[:, 3]) / 2], -1)
    level_id = np.repeat(np.arange(len(level_sizes)), level_sizes)
    anchors_j = jnp.asarray(anchors)
    centers_j = jnp.asarray(centers)

    gx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
    gy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
    dist = jnp.sqrt((centers_j[:, None, 0] - gx[None, :]) ** 2
                    + (centers_j[:, None, 1] - gy[None, :]) ** 2)   # (N, G)

    ious = bbox_overlaps(anchors_j, gt_bboxes)                      # (N, G)
    # per-level topk closest anchors are candidates
    cand = jnp.zeros(dist.shape, bool)
    start = 0
    for ls in level_sizes:
        d_lvl = dist[start:start + ls]                              # (ls, G)
        k = min(topk, ls)
        kth = -jax.lax.top_k(-d_lvl.T, k)[0][:, -1]                 # (G,)
        cand = cand.at[start:start + ls].set(d_lvl <= kth[None, :])
        start += ls
    cand = cand & gt_valid[None, :]

    cnt = jnp.maximum(cand.sum(0), 1)
    mean = (ious * cand).sum(0) / cnt
    # unbiased std (torch .std default, atss_assigner.py:133 divides by k-1)
    var = ((ious - mean[None, :]) ** 2 * cand).sum(0) \
        / jnp.maximum(cnt - 1, 1)
    thr = mean + jnp.sqrt(var)                                      # (G,)

    # center strictly inside with the reference's 0.01 margin
    # (atss_assigner.py:154 `min(l,t,r,b) > 0.01`)
    inside = (jnp.minimum(
        jnp.minimum(centers_j[:, None, 0] - gt_bboxes[None, :, 0],
                    gt_bboxes[None, :, 2] - centers_j[:, None, 0]),
        jnp.minimum(centers_j[:, None, 1] - gt_bboxes[None, :, 1],
                    gt_bboxes[None, :, 3] - centers_j[:, None, 1]))
        > 0.01)
    pos = cand & (ious >= thr[None, :]) & inside
    # each anchor takes the gt with max IoU among its positives
    iou_masked = jnp.where(pos, ious, -1.0)
    best = jnp.max(iou_masked, 1)
    assigned = jnp.where(best > -1.0,
                         jnp.argmax(iou_masked, 1).astype(jnp.int32) + 1, 0)
    del level_id
    return assigned


@HEADS.register_module()
class ATSSHead(AnchorHead):
    stacked_convs: int = 4
    norm_cfg: Optional[dict] = None
    loss_centerness: Optional[dict] = None

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
        atss_cls = nn.Conv(self.num_base_anchors * self.cls_out_channels,
                           (3, 3), padding=1, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(
                               bias_init_with_prob(0.01)), name="atss_cls")
        atss_reg = nn.Conv(self.num_base_anchors * 4, (3, 3), padding=1,
                           kernel_init=nn.initializers.normal(0.01),
                           dtype=self.dtype, name="atss_reg")
        atss_ctr = nn.Conv(self.num_base_anchors, (3, 3), padding=1,
                           kernel_init=nn.initializers.normal(0.01),
                           dtype=self.dtype, name="atss_centerness")
        cls_outs, reg_outs, ctr_outs = [], [], []
        for f in feats:
            cf, rf = f, f
            for conv in cls_convs:
                cf = conv(cf, train=train)
            for conv in reg_convs:
                rf = conv(rf, train=train)
            cls_outs.append(atss_cls(cf))
            reg_outs.append(atss_reg(rf))
            ctr_outs.append(atss_ctr(rf))
        return cls_outs, reg_outs, ctr_outs

    @staticmethod
    def centerness_from_anchor(anchors: jnp.ndarray,
                               gts: jnp.ndarray) -> jnp.ndarray:
        ax = (anchors[:, 0] + anchors[:, 2]) / 2
        ay = (anchors[:, 1] + anchors[:, 3]) / 2
        l = ax - gts[:, 0]
        t = ay - gts[:, 1]
        r = gts[:, 2] - ax
        b = gts[:, 3] - ay
        lr = jnp.stack([l, r], -1)
        tb = jnp.stack([t, b], -1)
        c = ((jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-12))
             * (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-12)))
        return jnp.sqrt(jnp.clip(c, 1e-12, None))

    def loss(self, cls_outs, reg_outs, ctr_outs, batch: Dict[str, Any],
             rng=None) -> Dict[str, jnp.ndarray]:
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        pad_shape = batch["pad_shape"]
        gen = self._build_generator()
        level_anchors = [np.asarray(a) for a in gen.grid_anchors(featmap_sizes)]
        level_sizes = [len(a) for a in level_anchors]
        anchors = np.concatenate(level_anchors).astype(np.float32)
        cls_cat, box_cat = self._flatten_preds(cls_outs, reg_outs)
        b, n = cls_cat.shape[:2]
        ctr_cat = jnp.concatenate(
            [c.reshape(b, -1) for c in ctr_outs], 1)
        means, stds = self._coder_params()
        topk = int((self.train_cfg or {}).get(
            "assigner", {}).get("topk", 9))

        def single(gtb, gtl, gv):
            assigned = atss_assign(anchors, level_sizes, gtb, gv, topk)
            pos = assigned > 0
            safe = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
            tgt = take_rows(gtb, safe)
            labels = jnp.where(pos, take_rows(gtl, safe),
                               self.num_classes)
            return assigned, pos, tgt, labels

        assigned, pos, tgt_boxes, labels = jax.vmap(single)(
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"])
        pos_f = pos.astype(jnp.float32)
        num_pos = jnp.maximum(pos_f.sum(), 1.0)

        loss_cls_fn = LOSSES.build(dict(
            self.loss_cls or dict(type="FocalLoss", use_sigmoid=True,
                                  gamma=2.0, alpha=0.25, loss_weight=1.0)))
        loss_cls = loss_cls_fn(cls_cat.reshape(b * n, -1),
                               labels.reshape(-1), avg_factor=num_pos)

        anchors_b = jnp.asarray(anchors)[None]
        decoded = delta2bbox(jnp.broadcast_to(anchors_b, (b, n, 4)), box_cat,
                             means, stds)
        ctr_t = jax.vmap(self.centerness_from_anchor)(
            jnp.broadcast_to(anchors_b, (b, n, 4)), tgt_boxes)
        ctr_t = jnp.where(pos, ctr_t, 0.0)
        ctr_denorm = jnp.maximum(ctr_t.sum(), 1e-6)
        loss_bbox_fn = LOSSES.build(dict(
            self.loss_bbox or dict(type="GIoULoss", loss_weight=2.0)))
        loss_bbox = loss_bbox_fn(decoded.reshape(-1, 4),
                                 tgt_boxes.reshape(-1, 4),
                                 weight=ctr_t.reshape(-1),
                                 avg_factor=ctr_denorm)
        bce = (jnp.maximum(ctr_cat, 0) - ctr_cat * ctr_t
               + jnp.log1p(jnp.exp(-jnp.abs(ctr_cat))))
        loss_ctr = (bce * pos_f).sum() / num_pos
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "loss_centerness": loss_ctr, "num_pos": pos_f.sum()}

    def get_bboxes(self, cls_outs, reg_outs, ctr_outs, img_shapes, pad_shape,
                   scale_factors=None, rescale: bool = False):
        """Score = sigmoid(cls) × sigmoid(centerness) via the reference
        score_factors contract (atss_head.py:495 + bbox_nms.py:55-62): the
        score threshold gates the raw cls score; centerness multiplies
        after, for ranking and the output score."""
        return AnchorHead.get_bboxes(self, cls_outs, reg_outs, img_shapes,
                                     pad_shape, scale_factors, rescale,
                                     factor_outs=ctr_outs)