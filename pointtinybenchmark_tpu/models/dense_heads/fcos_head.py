"""FCOSHead — anchor-free single-stage head.

Parity target: mmdet models/dense_heads/fcos_head.py:648 — per-level points
at cell centers, regress-range level assignment, min-area gt selection,
centerness branch; the "Adap" tiny recipe compresses regress_ranges to
((-1,16),(16,32),(32,64),(64,128),(128,INF)) with strides from 4
(SURVEY.md §2.2, fcos_standard config).

TPU design: all levels concatenate to one static (N,) point set; the
point-in-box / range test and min-area selection are one batched masked
reduction (B, N, G) instead of the reference's per-image host loop.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.bbox import distance2bbox
from ...core.post_processing import DetResult, multiclass_nms
from ...utils.registry import HEADS, LOSSES
from ...ops.gather import take_rows
from ..utils import ConvModule, bias_init_with_prob

__all__ = ["FCOSHead"]

INF = 1e8


class Scale(nn.Module):
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.constant(self.init_value), ())
        return x * scale


@HEADS.register_module()
class FCOSHead(nn.Module):
    num_classes: int
    in_channels: int
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (4, 8, 16, 32, 64)
    regress_ranges: Sequence[Tuple[float, float]] = (
        (-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))
    center_sampling: bool = False
    center_sample_radius: float = 1.5
    norm_on_bbox: bool = False
    centerness_on_reg: bool = False
    norm_cfg: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    loss_centerness: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
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
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=1,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(
                               bias_init_with_prob(0.01)),
                           dtype=self.dtype, name="conv_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name="conv_reg")
        conv_centerness = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                                  kernel_init=nn.initializers.normal(0.01),
                                  name="conv_centerness")
        scales = [Scale(name=f"scale{i}") for i in range(len(self.strides))]

        cls_outs, reg_outs, ctr_outs = [], [], []
        for i, f in enumerate(feats):
            cf, rf = f, f
            for conv in cls_convs:
                cf = conv(cf, train=train)
            for conv in reg_convs:
                rf = conv(rf, train=train)
            cls_outs.append(conv_cls(cf))
            ctr_outs.append(conv_centerness(rf if self.centerness_on_reg else cf))
            reg = scales[i](conv_reg(rf))
            if self.norm_on_bbox:
                reg = nn.relu(reg)
                if not train:
                    reg = reg * self.strides[i]
            else:
                reg = jnp.exp(reg)
            reg_outs.append(reg)
        return cls_outs, reg_outs, ctr_outs

    # -------------------------------------------------------------- points
    def flat_points(self, featmap_sizes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(N, 2) points, (N,) stride, (N, 2) regress range."""
        pts, strides, ranges = [], [], []
        for (h, w), s, rr in zip(featmap_sizes, self.strides,
                                 self.regress_ranges):
            xs = (np.arange(w) * s + s // 2).astype(np.float32)
            ys = (np.arange(h) * s + s // 2).astype(np.float32)
            xx, yy = np.meshgrid(xs, ys)
            p = np.stack([xx.ravel(), yy.ravel()], -1)
            pts.append(p)
            strides.append(np.full((len(p),), s, np.float32))
            ranges.append(np.tile(np.asarray(rr, np.float32), (len(p), 1)))
        return (np.concatenate(pts), np.concatenate(strides),
                np.concatenate(ranges))

    # ------------------------------------------------------------- targets
    def get_targets(self, points: np.ndarray, strides: np.ndarray,
                    ranges: np.ndarray, batch: Dict[str, jnp.ndarray]):
        """labels (B, N), bbox_targets ltrb (B, N, 4), pos (B, N)."""
        pts = jnp.asarray(points)
        rr = jnp.asarray(ranges)
        st = jnp.asarray(strides)

        def single(gt_bboxes, gt_labels, gt_valid):
            areas = ((gt_bboxes[:, 2] - gt_bboxes[:, 0])
                     * (gt_bboxes[:, 3] - gt_bboxes[:, 1]))          # (G,)
            l = pts[:, None, 0] - gt_bboxes[None, :, 0]
            t = pts[:, None, 1] - gt_bboxes[None, :, 1]
            r = gt_bboxes[None, :, 2] - pts[:, None, 0]
            b_ = gt_bboxes[None, :, 3] - pts[:, None, 1]
            ltrb = jnp.stack([l, t, r, b_], -1)                     # (N, G, 4)
            if self.center_sampling:
                cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
                cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
                rad = st[:, None] * self.center_sample_radius
                cb_x1 = jnp.maximum(cx[None, :] - rad, gt_bboxes[None, :, 0])
                cb_y1 = jnp.maximum(cy[None, :] - rad, gt_bboxes[None, :, 1])
                cb_x2 = jnp.minimum(cx[None, :] + rad, gt_bboxes[None, :, 2])
                cb_y2 = jnp.minimum(cy[None, :] + rad, gt_bboxes[None, :, 3])
                inside = ((pts[:, None, 0] > cb_x1) & (pts[:, None, 0] < cb_x2)
                          & (pts[:, None, 1] > cb_y1) & (pts[:, None, 1] < cb_y2))
            else:
                inside = jnp.min(ltrb, -1) > 0                      # (N, G)
            max_reg = jnp.max(ltrb, -1)
            in_range = (max_reg >= rr[:, None, 0]) & (max_reg <= rr[:, None, 1])
            cand = inside & in_range & gt_valid[None, :]
            area_mat = jnp.where(cand, areas[None, :], INF)
            min_area = jnp.min(area_mat, -1)
            gt_idx = jnp.argmin(area_mat, -1)                       # (N,)
            pos = min_area < INF
            labels = jnp.where(pos, take_rows(gt_labels, gt_idx),
                               self.num_classes)
            tgt = take_rows(ltrb, gt_idx[:, None])[:, 0]
            return labels, tgt, pos

        return jax.vmap(single)(batch["gt_bboxes"], batch["gt_labels"],
                                batch["gt_valid"])

    @staticmethod
    def centerness_target(ltrb: jnp.ndarray) -> jnp.ndarray:
        lr = ltrb[..., [0, 2]]
        tb = ltrb[..., [1, 3]]
        c = ((jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-12))
             * (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-12)))
        return jnp.sqrt(jnp.clip(c, 0, None))

    # ---------------------------------------------------------------- loss
    def loss(self, cls_outs, reg_outs, ctr_outs, batch: Dict[str, Any],
             rng=None) -> Dict[str, jnp.ndarray]:
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        points, strides, ranges = self.flat_points(featmap_sizes)
        b = cls_outs[0].shape[0]
        cls_cat = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes) for c in cls_outs], 1)
        reg_list = []
        for i, r in enumerate(reg_outs):
            rr = r.reshape(b, -1, 4)
            if self.norm_on_bbox:  # train-mode outputs are stride-normalized
                rr = rr * self.strides[i]
            reg_list.append(rr)
        reg_cat = jnp.concatenate(reg_list, 1)
        ctr_cat = jnp.concatenate([c.reshape(b, -1) for c in ctr_outs], 1)

        labels, bbox_targets, pos = self.get_targets(points, strides, ranges,
                                                     batch)
        pos_f = pos.astype(jnp.float32)
        num_pos = jnp.maximum(pos_f.sum(), 1.0)

        loss_cls_fn = LOSSES.build(dict(
            self.loss_cls or dict(type="FocalLoss", use_sigmoid=True,
                                  gamma=2.0, alpha=0.25, loss_weight=1.0)))
        loss_cls = loss_cls_fn(cls_cat.reshape(-1, self.num_classes),
                               labels.reshape(-1), avg_factor=num_pos)

        ctr_targets = self.centerness_target(bbox_targets)
        pts_b = jnp.asarray(points)[None]
        decoded_pred = distance2bbox(
            jnp.broadcast_to(pts_b, (b,) + points.shape), reg_cat)
        decoded_tgt = distance2bbox(
            jnp.broadcast_to(pts_b, (b,) + points.shape), bbox_targets)
        loss_bbox_fn = LOSSES.build(dict(
            self.loss_bbox or dict(type="IoULoss", loss_weight=1.0)))
        ctr_denorm = jnp.maximum((ctr_targets * pos_f).sum(), 1e-6)
        loss_bbox = loss_bbox_fn(decoded_pred.reshape(-1, 4),
                                 decoded_tgt.reshape(-1, 4),
                                 weight=(ctr_targets * pos_f).reshape(-1),
                                 avg_factor=ctr_denorm)

        loss_ctr_fn = LOSSES.build(dict(
            self.loss_centerness or dict(type="CrossEntropyLoss",
                                         use_sigmoid=True, loss_weight=1.0)))
        # BCE with soft target on positives only
        ctr_logit = ctr_cat.reshape(-1)
        ctr_t = ctr_targets.reshape(-1)
        bce = (jnp.maximum(ctr_logit, 0) - ctr_logit * ctr_t
               + jnp.log1p(jnp.exp(-jnp.abs(ctr_logit))))
        loss_ctr = (bce * pos_f.reshape(-1)).sum() / num_pos
        del loss_ctr_fn
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "loss_centerness": loss_ctr, "num_pos": num_pos}

    # ------------------------------------------------------------ inference
    def get_bboxes(self, cls_outs, reg_outs, ctr_outs, img_shapes, pad_shape,
                   scale_factors=None, rescale: bool = False) -> DetResult:
        cfg = self.test_cfg or {}
        nms_pre = int(cfg.get("nms_pre", 1000))
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg.get("nms", {}).get("iou_threshold", 0.5))
        max_per_img = int(cfg.get("max_per_img", 100))
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        b = cls_outs[0].shape[0]

        level_points = []
        for (h, w), s in zip(featmap_sizes, self.strides):
            xs = (np.arange(w) * s + s // 2).astype(np.float32)
            ys = (np.arange(h) * s + s // 2).astype(np.float32)
            xx, yy = np.meshgrid(xs, ys)
            level_points.append(np.stack([xx.ravel(), yy.ravel()], -1))

        cls_levels = [c.reshape(b, -1, self.num_classes) for c in cls_outs]
        reg_levels = [r.reshape(b, -1, 4) for r in reg_outs]
        ctr_levels = [c.reshape(b, -1) for c in ctr_outs]

        def single(cls_list, reg_list, ctr_list, img_shape, scale_factor):
            boxes_all, scores_all, ctr_all = [], [], []
            for lvl in range(len(cls_list)):
                sc = jax.nn.sigmoid(cls_list[lvl])
                ctr = jax.nn.sigmoid(ctr_list[lvl])
                rank = jnp.max(sc, -1) * ctr
                k = min(nms_pre, sc.shape[0]) if nms_pre > 0 else sc.shape[0]
                _, idx = jax.lax.top_k(rank, k)
                boxes = distance2bbox(jnp.asarray(level_points[lvl])[idx],
                                      reg_list[lvl][idx])
                boxes = jnp.stack([
                    jnp.clip(boxes[:, 0], 0, img_shape[1]),
                    jnp.clip(boxes[:, 1], 0, img_shape[0]),
                    jnp.clip(boxes[:, 2], 0, img_shape[1]),
                    jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
                boxes_all.append(boxes)
                scores_all.append(sc[idx])
                ctr_all.append(ctr[idx])
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            ctrs = jnp.concatenate(ctr_all)
            if rescale and scale_factor is not None:
                boxes = boxes / scale_factor
            scores = jnp.concatenate(
                [scores, jnp.zeros((scores.shape[0], 1))], -1)
            # reference semantics (fcos_head.py:462 + bbox_nms.py:55-62):
            # score_thr gates the RAW cls score; centerness multiplies after.
            return multiclass_nms(boxes, scores, score_thr, iou_thr,
                                  max_per_img, score_factors=ctrs)

        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        dets = jax.vmap(single)(cls_levels, reg_levels, ctr_levels,
                                img_shapes, sf)
        return dets, None
