"""SABL RetinaNet head — Side-Aware Boundary Localization (arXiv 1912.04260).

Parity target: mmdet models/dense_heads/sabl_retina_head.py:17 — square
anchors assigned via ApproxMaxIoU, box regression split into per-side bucket
estimation (classification over side_num buckets) + fine within-bucket
regression; decode applies bucketing-guided rescoring (loc confidence
multiplies the class score before NMS).

TPU redesign: one flat (B, N) anchor layout, vmapped batched targets, all
bucket targets from the vectorized bbox2bucket (core/bbox.py); inference is
per-level static top-k + bucket2bbox + shared multiclass NMS.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.bbox import bbox2bucket, bucket2bbox
from ...core.post_processing import DetResult, multiclass_nms
from ...ops.iou import bbox_overlaps
from ...utils.registry import HEADS, LOSSES
from ...ops.gather import take_rows
from ..utils import ConvModule, bias_init_with_prob
from .guided_anchor_head import GuidedAnchorHead

__all__ = ["SABLRetinaHead"]


@HEADS.register_module()
class SABLRetinaHead(GuidedAnchorHead):
    """Reuses GuidedAnchorHead's approx/square anchor machinery; replaces
    the shape/loc branches with side-aware bucketing regression."""
    bbox_coder_cfg: Optional[dict] = None   # BucketingBBoxCoder params
    loss_bbox_cls: Optional[dict] = None
    loss_bbox_reg: Optional[dict] = None

    @property
    def num_buckets(self) -> int:
        return int((self.bbox_coder_cfg or {}).get("num_buckets", 14))

    @property
    def bucket_scale(self) -> float:
        return float((self.bbox_coder_cfg or {}).get("scale_factor", 3.0))

    @property
    def side_num(self) -> int:
        return int(np.ceil(self.num_buckets / 2.0))

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        norm = (self.norm_cfg or {}).get("type")
        cls_convs = [ConvModule(self.feat_channels, 3, norm=norm,
                                dtype=self.dtype, name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [ConvModule(self.feat_channels, 3, norm=norm,
                                dtype=self.dtype, name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        retina_cls = nn.Conv(self.cls_out_channels, (3, 3), padding=1,
                             dtype=self.dtype, name="retina_cls",
                             kernel_init=nn.initializers.normal(0.01),
                             bias_init=nn.initializers.constant(
                                 bias_init_with_prob(0.01)))
        retina_bbox_cls = nn.Conv(self.side_num * 4, (3, 3), padding=1,
                                  kernel_init=nn.initializers.normal(0.01),
                                  dtype=self.dtype, name="retina_bbox_cls")
        retina_bbox_reg = nn.Conv(self.side_num * 4, (3, 3), padding=1,
                                  kernel_init=nn.initializers.normal(0.01),
                                  dtype=self.dtype, name="retina_bbox_reg")
        cls_outs, bcls_outs, breg_outs = [], [], []
        for f in feats:
            cf, rf = f, f
            for conv in cls_convs:
                cf = conv(cf, train=train)
            for conv in reg_convs:
                rf = conv(rf, train=train)
            cls_outs.append(retina_cls(cf))
            bcls_outs.append(retina_bbox_cls(rf))
            breg_outs.append(retina_bbox_reg(rf))
        return cls_outs, bcls_outs, breg_outs

    # ---------------------------------------------------------------- loss
    def loss(self, cls_outs, bcls_outs, breg_outs, batch: Dict[str, Any],
             rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
        from ...core.assigners import MaxIoUAssigner
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        squares_np, approxs_np, valid_np = self._flat_anchor_arrays(
            featmap_sizes, batch["pad_shape"])
        squares = jnp.asarray(squares_np)
        approxs = jnp.asarray(approxs_np)
        sq_valid = jnp.asarray(valid_np)
        n, napprox = approxs_np.shape[:2]
        b = cls_outs[0].shape[0]
        sn = self.side_num
        coder_cfg = self.bbox_coder_cfg or {}
        offset_topk = int(coder_cfg.get("offset_topk", 2))
        offset_ub = float(coder_cfg.get("offset_upperbound", 1.0))
        cls_ign = bool(coder_cfg.get("cls_ignore_neighbor", True))

        cls_cat = jnp.concatenate(
            [c.reshape(b, -1, self.cls_out_channels) for c in cls_outs], 1)
        bcls_cat = jnp.concatenate(
            [c.reshape(b, -1, sn * 4) for c in bcls_outs], 1)
        breg_cat = jnp.concatenate(
            [c.reshape(b, -1, sn * 4) for c in breg_outs], 1)

        a_cfg = dict((self.train_cfg or {}).get("assigner") or dict(
            pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0))
        a_cfg.pop("type", None)
        assigner = MaxIoUAssigner(**a_cfg)
        pos_weight = float((self.train_cfg or {}).get("pos_weight", -1))

        def single(gt, gt_labels, gt_valid):
            ov = bbox_overlaps(approxs.reshape(n * napprox, 4), gt)
            ov = jnp.where(gt_valid[None, :],
                           ov.reshape(n, napprox, -1).max(1), 0.0)
            assigned, _, labels = assigner.assign(
                squares, gt, gt_valid, gt_labels, overlaps=ov,
                bbox_valid=sq_valid)
            pos = assigned > 0
            neg = assigned == 0
            safe = jnp.clip(assigned - 1, 0, gt.shape[0] - 1)
            offs, ow, bl, cw = bbox2bucket(
                squares, take_rows(gt, safe), self.num_buckets, self.bucket_scale,
                offset_topk, offset_ub, cls_ign)
            posf = pos[:, None].astype(jnp.float32)
            out_labels = jnp.where(pos, labels, self.num_classes)
            lw = (pos.astype(jnp.float32)
                  * (1.0 if pos_weight <= 0 else pos_weight)
                  + neg.astype(jnp.float32))
            return (out_labels, lw, offs * posf, ow * posf, bl * posf,
                    cw * posf, pos.astype(jnp.float32))

        (labels, label_w, breg_t, breg_w, bcls_t, bcls_w,
         pos_mask) = jax.vmap(single)(batch["gt_bboxes"], batch["gt_labels"],
                                      batch["gt_valid"])
        num_pos = jnp.maximum(pos_mask.sum(), 1.0)

        loss_cls_fn = LOSSES.build(dict(self.loss_cls or dict(
            type="FocalLoss", use_sigmoid=True, gamma=2.0, alpha=0.25)))
        loss_bcls_fn = LOSSES.build(dict(self.loss_bbox_cls or dict(
            type="CrossEntropyLoss", use_sigmoid=True, loss_weight=1.5)))
        loss_breg_fn = LOSSES.build(dict(self.loss_bbox_reg or dict(
            type="SmoothL1Loss", beta=1.0 / 9.0, loss_weight=1.5)))
        loss_cls = loss_cls_fn(cls_cat.reshape(b * n, -1), labels.reshape(-1),
                               weight=label_w.reshape(-1), avg_factor=num_pos)
        loss_bbox_cls = loss_bcls_fn(
            bcls_cat.reshape(-1, sn * 4), bcls_t.reshape(-1, sn * 4),
            weight=bcls_w.reshape(-1, sn * 4),
            avg_factor=num_pos * 4 * sn)
        loss_bbox_reg = loss_breg_fn(
            breg_cat.reshape(-1, sn * 4), breg_t.reshape(-1, sn * 4),
            weight=breg_w.reshape(-1, sn * 4),
            avg_factor=num_pos * 4 * offset_topk)
        return {"loss_cls": loss_cls, "loss_bbox_cls": loss_bbox_cls,
                "loss_bbox_reg": loss_bbox_reg, "num_pos": num_pos}

    # ------------------------------------------------------------- decode
    def get_bboxes(self, cls_outs, bcls_outs, breg_outs, img_shapes,
                   pad_shape, scale_factors=None,
                   rescale: bool = False) -> DetResult:
        cfg = self.test_cfg or {}
        nms_pre = int(cfg.get("nms_pre", 1000))
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg.get("nms", {}).get("iou_threshold", 0.5))
        max_per_img = int(cfg.get("max_per_img", 100))
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        sq_gen = self._square_gen()
        level_squares = [np.asarray(a).astype(np.float32)
                         for a in sq_gen.grid_anchors(featmap_sizes)]
        b = cls_outs[0].shape[0]
        sn = self.side_num

        def single(cls_list, bcls_list, breg_list, img_shape, scale_factor):
            pts, scs, cfd = [], [], []
            for lvl in range(len(cls_list)):
                sc = (jax.nn.sigmoid(cls_list[lvl]) if self.use_sigmoid_cls
                      else jax.nn.softmax(cls_list[lvl], -1))
                max_s = (jnp.max(sc, -1) if self.use_sigmoid_cls
                         else jnp.max(sc[:, :-1], -1))
                k = min(nms_pre, sc.shape[0]) if nms_pre > 0 else sc.shape[0]
                _, idx = jax.lax.top_k(max_s, k)
                boxes, confids = bucket2bbox(
                    jnp.asarray(level_squares[lvl])[idx],
                    bcls_list[lvl][idx], breg_list[lvl][idx],
                    self.num_buckets, self.bucket_scale, max_shape=None)
                boxes = jnp.stack([
                    jnp.clip(boxes[:, 0], 0, img_shape[1]),
                    jnp.clip(boxes[:, 1], 0, img_shape[0]),
                    jnp.clip(boxes[:, 2], 0, img_shape[1]),
                    jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
                pts.append(boxes)
                scs.append(sc[idx])
                cfd.append(confids)
            boxes = jnp.concatenate(pts)
            scores = jnp.concatenate(scs)
            confids = jnp.concatenate(cfd)
            if rescale and scale_factor is not None:
                boxes = boxes / scale_factor
            if self.use_sigmoid_cls:
                scores = jnp.concatenate(
                    [scores, jnp.zeros((scores.shape[0], 1))], -1)
            # bucketing-guided rescoring via the reference score_factors
            # contract (sabl_retina_head.py:621 + bbox_nms.py:55-62):
            # score_thr gates the raw cls score, confid multiplies after.
            return multiclass_nms(boxes, scores, score_thr, iou_thr,
                                  max_per_img, score_factors=confids)

        cls_levels = [c.reshape(b, -1, self.cls_out_channels)
                      for c in cls_outs]
        bcls_levels = [c.reshape(b, -1, sn * 4) for c in bcls_outs]
        breg_levels = [c.reshape(b, -1, sn * 4) for c in breg_outs]
        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        dets = jax.vmap(single)(cls_levels, bcls_levels, breg_levels,
                                img_shapes, sf)
        return dets, None
