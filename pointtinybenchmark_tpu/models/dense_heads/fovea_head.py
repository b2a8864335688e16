"""FoveaHead — anchor-free head with fovea-area (shrunk-box) assignment.

Parity target: mmdet models/dense_heads/fovea_head.py — per-level scale
ranges on sqrt(gt area), positives inside the sigma-shrunk gt box,
log-space side-distance regression normalized by a per-level base edge,
FocalLoss cls + SmoothL1(beta=0.11) reg. (FeatureAlign/DCN variant not
ported — align=False path only.)

TPU design: like FCOSHead, all levels flatten to one static point set and
assignment is a (B, N, G) masked min-area reduction; the reference's
per-gt python loop over discrete index ranges becomes a continuous
inside-shrunk-box test (boundary pixels may differ by the ceil/floor of
the reference's index rounding — sub-pixel deviation, documented).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.post_processing import DetResult, multiclass_nms
from ...utils.registry import HEADS, LOSSES
from ...ops.gather import take_rows
from ..utils import ConvModule, bias_init_with_prob

__all__ = ["FoveaHead"]

INF = 1e8


@HEADS.register_module()
class FoveaHead(nn.Module):
    num_classes: int
    in_channels: int
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    base_edge_list: Sequence[int] = (16, 32, 64, 128, 256)
    scale_ranges: Sequence[Tuple[float, float]] = (
        (1, 64), (32, 128), (64, 256), (128, 512), (256, 2048))
    sigma: float = 0.4
    norm_cfg: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        norm = (self.norm_cfg or {}).get("type")
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
        cls_outs, reg_outs = [], []
        for f in feats:
            cf, rf = f, f
            for conv in cls_convs:
                cf = conv(cf, train=train)
            for conv in reg_convs:
                rf = conv(rf, train=train)
            cls_outs.append(conv_cls(cf))
            reg_outs.append(conv_reg(rf))
        return cls_outs, reg_outs

    # -------------------------------------------------------------- points
    def flat_points(self, featmap_sizes):
        """(N,2) pixel centers, (N,) stride, (N,) base edge, (N,2) range."""
        pts, strides, bases, ranges = [], [], [], []
        for (h, w), s, be, rr in zip(featmap_sizes, self.strides,
                                     self.base_edge_list, self.scale_ranges):
            xs = (np.arange(w) * s + s / 2).astype(np.float32)
            ys = (np.arange(h) * s + s / 2).astype(np.float32)
            xx, yy = np.meshgrid(xs, ys)
            p = np.stack([xx.ravel(), yy.ravel()], -1)
            pts.append(p)
            strides.append(np.full((len(p),), s, np.float32))
            bases.append(np.full((len(p),), be, np.float32))
            ranges.append(np.tile(np.asarray(rr, np.float32), (len(p), 1)))
        return (np.concatenate(pts), np.concatenate(strides),
                np.concatenate(bases), np.concatenate(ranges))

    # ------------------------------------------------------------- targets
    def get_targets(self, points, strides, bases, ranges, batch):
        pts = jnp.asarray(points)
        rr = jnp.asarray(ranges)
        be = jnp.asarray(bases)

        def single(gt_bboxes, gt_labels, gt_valid):
            w = gt_bboxes[:, 2] - gt_bboxes[:, 0]
            h = gt_bboxes[:, 3] - gt_bboxes[:, 1]
            edge = jnp.sqrt(jnp.clip(w * h, 1e-6, None))            # (G,)
            in_range = (edge[None, :] >= rr[:, None, 0]) & \
                       (edge[None, :] <= rr[:, None, 1])            # (N, G)
            cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
            cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
            hw = 0.5 * self.sigma * w
            hh = 0.5 * self.sigma * h
            inside = ((pts[:, None, 0] >= cx[None] - hw[None])
                      & (pts[:, None, 0] <= cx[None] + hw[None])
                      & (pts[:, None, 1] >= cy[None] - hh[None])
                      & (pts[:, None, 1] <= cy[None] + hh[None]))
            cand = in_range & inside & gt_valid[None, :]
            area = w * h
            area_mat = jnp.where(cand, area[None, :], INF)
            gt_idx = jnp.argmin(area_mat, -1)
            pos = jnp.min(area_mat, -1) < INF
            labels = jnp.where(pos, take_rows(gt_labels, gt_idx),
                               self.num_classes)
            gb = take_rows(gt_bboxes, gt_idx)                                  # (N, 4)
            d = jnp.stack([pts[:, 0] - gb[:, 0], pts[:, 1] - gb[:, 1],
                           gb[:, 2] - pts[:, 0], gb[:, 3] - pts[:, 1]], -1)
            tgt = jnp.log(jnp.clip(d / be[:, None], 1.0 / 16, 16.0))
            return labels, tgt, pos

        return jax.vmap(single)(batch["gt_bboxes"], batch["gt_labels"],
                                batch["gt_valid"])

    # ---------------------------------------------------------------- loss
    def loss(self, cls_outs, reg_outs, batch: Dict[str, Any],
             rng=None) -> Dict[str, jnp.ndarray]:
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        points, strides, bases, ranges = self.flat_points(featmap_sizes)
        b = cls_outs[0].shape[0]
        cls_cat = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes) for c in cls_outs], 1)
        reg_cat = jnp.concatenate([r.reshape(b, -1, 4) for r in reg_outs], 1)
        labels, tgt, pos = self.get_targets(points, strides, bases, ranges,
                                            batch)
        pos_f = pos.astype(jnp.float32)
        num_pos = jnp.maximum(pos_f.sum(), 1.0)
        loss_cls_fn = LOSSES.build(dict(
            self.loss_cls or dict(type="FocalLoss", use_sigmoid=True,
                                  gamma=2.0, alpha=0.25, loss_weight=1.0)))
        loss_cls = loss_cls_fn(cls_cat.reshape(-1, self.num_classes),
                               labels.reshape(-1), avg_factor=num_pos)
        loss_bbox_fn = LOSSES.build(dict(
            self.loss_bbox or dict(type="SmoothL1Loss", beta=0.11,
                                   loss_weight=1.0)))
        w4 = jnp.broadcast_to(pos_f.reshape(-1)[:, None],
                              (pos_f.size, 4))
        loss_bbox = loss_bbox_fn(reg_cat.reshape(-1, 4), tgt.reshape(-1, 4),
                                 weight=w4, avg_factor=num_pos * 4)
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "num_pos": num_pos}

    # ------------------------------------------------------------ inference
    def get_bboxes(self, cls_outs, reg_outs, img_shapes, pad_shape,
                   scale_factors=None, rescale: bool = False) -> DetResult:
        cfg = self.test_cfg or {}
        nms_pre = int(cfg.get("nms_pre", 1000))
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg.get("nms", {}).get("iou_threshold", 0.5))
        max_per_img = int(cfg.get("max_per_img", 100))
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        b = cls_outs[0].shape[0]
        lvl_pts, lvl_bases = [], []
        for (h, w), s, be in zip(featmap_sizes, self.strides,
                                 self.base_edge_list):
            xs = (np.arange(w) * s + s / 2).astype(np.float32)
            ys = (np.arange(h) * s + s / 2).astype(np.float32)
            xx, yy = np.meshgrid(xs, ys)
            lvl_pts.append(np.stack([xx.ravel(), yy.ravel()], -1))
            lvl_bases.append(be)
        cls_levels = [c.reshape(b, -1, self.num_classes) for c in cls_outs]
        reg_levels = [r.reshape(b, -1, 4) for r in reg_outs]

        def single(cls_list, reg_list, img_shape, scale_factor):
            boxes_all, scores_all = [], []
            for lvl in range(len(cls_list)):
                sc = jax.nn.sigmoid(cls_list[lvl])
                rank = jnp.max(sc, -1)
                k = min(nms_pre, sc.shape[0]) if nms_pre > 0 else sc.shape[0]
                _, idx = jax.lax.top_k(rank, k)
                p = jnp.asarray(lvl_pts[lvl])[idx]
                d = jnp.exp(reg_list[lvl][idx]) * lvl_bases[lvl]
                boxes = jnp.stack([
                    jnp.clip(p[:, 0] - d[:, 0], 0, img_shape[1]),
                    jnp.clip(p[:, 1] - d[:, 1], 0, img_shape[0]),
                    jnp.clip(p[:, 0] + d[:, 2], 0, img_shape[1]),
                    jnp.clip(p[:, 1] + d[:, 3], 0, img_shape[0])], -1)
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

        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        dets = jax.vmap(single)(cls_levels, reg_levels, img_shapes, sf)
        return dets, None
