"""VFNetHead — VarifocalNet (IoU-aware dense detector).

Parity target: mmdet models/dense_heads/vfnet_head.py — initial ltrb
regression, star-shaped 9-point deformable sampling driven by the initial
box, refined regression as a multiplicative factor on the (detached)
initial box, IoU-aware classification trained with VarifocalLoss whose
positive targets are the IoU of the refined box with its gt, ATSS
assignment on synthesized stride-square anchors.

TPU design: the star DCN is a bilinear 9-point gather (reppoints_head's
deform_gather pattern) followed by a 1x1 conv over the stacked K*C
features — mathematically a DeformConv2d with per-sample-point weights and
XLA-fusable. Assignment reuses atss_head.atss_assign over one flat
static point/anchor set.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.bbox import distance2bbox
from ...core.post_processing import DetResult, multiclass_nms
from ...ops.grid_sample import point_sample_pixel
from ...ops.iou import bbox_overlaps_aligned
from ...utils.registry import HEADS, LOSSES
from ..utils import ConvModule, bias_init_with_prob
from .atss_head import atss_assign
from .fcos_head import Scale

__all__ = ["VFNetHead"]

# star sampling pattern: (dy, dx) unit multipliers over the initial box
# sides — 3x3 grid over (l, t, r, b) like the reference's star dconv
_STAR = [(-1, -1), (-1, 0), (-1, 1),
         (0, -1), (0, 0), (0, 1),
         (1, -1), (1, 0), (1, 1)]


@HEADS.register_module()
class VFNetHead(nn.Module):
    num_classes: int
    in_channels: int
    feat_channels: int = 256
    stacked_convs: int = 3
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    gradient_mul: float = 0.1
    anchor_scale: int = 8          # ATSS square-anchor scale
    atss_topk: int = 9
    norm_cfg: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    loss_bbox_refine: Optional[dict] = None
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
        reg_initial = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                              kernel_init=nn.initializers.normal(0.01),
                              name="vfnet_reg")
        refine_dcn_w = nn.Conv(self.feat_channels, (1, 1), dtype=self.dtype,
                               name="reg_refine_dcn")
        reg_refine = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name="vfnet_reg_refine")
        cls_dcn_w = nn.Conv(self.feat_channels, (1, 1), dtype=self.dtype,
                            name="cls_dcn")
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=1,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(
                               bias_init_with_prob(0.01)),
                           dtype=self.dtype, name="vfnet_cls")
        scales = [Scale(name=f"scale{i}") for i in range(len(self.strides))]
        scales_r = [Scale(name=f"scale_refine{i}")
                    for i in range(len(self.strides))]

        def star_gather(feat, ltrb_cells):
            """Sample feat at the 9 star points of the per-position box.

            ltrb_cells (B,H,W,4): box side distances in feature cells.
            Returns (B,H,W,9*C)."""
            b, h, w, c = feat.shape
            gy = jnp.arange(h, dtype=feat.dtype)[None, :, None]
            gx = jnp.arange(w, dtype=feat.dtype)[None, None, :]
            l, t, r, bo = (ltrb_cells[..., 0], ltrb_cells[..., 1],
                           ltrb_cells[..., 2], ltrb_cells[..., 3])
            pts = []
            for sy, sx in _STAR:
                dy = jnp.where(sy < 0, -t, jnp.where(sy > 0, bo, 0.0))
                dx = jnp.where(sx < 0, -l, jnp.where(sx > 0, r, 0.0))
                pts.append(jnp.stack([gx + dx, gy + dy], -1))
            p = jnp.stack(pts, 3).reshape(b, h * w * 9, 2)
            out = point_sample_pixel(feat, p, padding_mode="zeros")
            return out.reshape(b, h, w, 9 * c)

        cls_outs, init_outs, refine_outs = [], [], []
        for i, f in enumerate(feats):
            cf, rf = f, f
            for conv in cls_convs:
                cf = conv(cf, train=train)
            for conv in reg_convs:
                rf = conv(rf, train=train)
            s = float(self.strides[i])
            init = jnp.exp(scales[i](reg_initial(rf))) * s     # ltrb px
            init_gm = ((1 - self.gradient_mul)
                       * jax.lax.stop_gradient(init)
                       + self.gradient_mul * init)
            cells = init_gm / s
            ref_feat = nn.relu(refine_dcn_w(star_gather(rf, cells)))
            refine = jnp.exp(scales_r[i](reg_refine(ref_feat))) \
                * jax.lax.stop_gradient(init)
            cls_feat = nn.relu(cls_dcn_w(star_gather(cf, cells)))
            cls_outs.append(conv_cls(cls_feat))
            init_outs.append(init)
            refine_outs.append(refine)
        return cls_outs, init_outs, refine_outs

    # -------------------------------------------------------------- points
    def flat_points(self, featmap_sizes):
        pts, strides, sizes = [], [], []
        for (h, w), s in zip(featmap_sizes, self.strides):
            xs = (np.arange(w) * s + s / 2).astype(np.float32)
            ys = (np.arange(h) * s + s / 2).astype(np.float32)
            xx, yy = np.meshgrid(xs, ys)
            p = np.stack([xx.ravel(), yy.ravel()], -1)
            pts.append(p)
            strides.append(np.full((len(p),), s, np.float32))
            sizes.append(len(p))
        return np.concatenate(pts), np.concatenate(strides), sizes

    # ---------------------------------------------------------------- loss
    def loss(self, cls_outs, init_outs, refine_outs, batch: Dict[str, Any],
             rng=None) -> Dict[str, jnp.ndarray]:
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        points, strides, level_sizes = self.flat_points(featmap_sizes)
        b = cls_outs[0].shape[0]
        cls_cat = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes) for c in cls_outs], 1)
        init_cat = jnp.concatenate(
            [r.reshape(b, -1, 4) for r in init_outs], 1)
        ref_cat = jnp.concatenate(
            [r.reshape(b, -1, 4) for r in refine_outs], 1)
        # synthesized square anchors for ATSS assignment
        half = strides[:, None] * self.anchor_scale / 2
        anchors = np.concatenate([points - half, points + half], -1)
        pts_j = jnp.asarray(points)

        def single(cls_s, init_s, ref_s, gt_bboxes, gt_labels, gt_valid):
            assigned = atss_assign(anchors, level_sizes, gt_bboxes, gt_valid,
                                   topk=self.atss_topk)           # (N,)
            pos = assigned > 0
            gt_idx = jnp.clip(assigned - 1, 0, None)
            gb = gt_bboxes[gt_idx]
            labels = jnp.where(pos, gt_labels[gt_idx], self.num_classes)
            boxes_init = distance2bbox(pts_j, init_s)
            boxes_ref = distance2bbox(pts_j, ref_s)
            iou_init = bbox_overlaps_aligned(boxes_init, gb)
            iou_ref = bbox_overlaps_aligned(boxes_ref, gb)
            return (labels, pos, gb, iou_init, iou_ref,
                    boxes_init, boxes_ref)

        (labels, pos, gb, iou_init, iou_ref, boxes_init,
         boxes_ref) = jax.vmap(single)(cls_cat, init_cat, ref_cat,
                                       batch["gt_bboxes"],
                                       batch["gt_labels"],
                                       batch["gt_valid"])
        pos_f = pos.astype(jnp.float32)
        num_pos = jnp.maximum(pos_f.sum(), 1.0)

        # varifocal target: IoU of the refined box at positive locations
        q = jax.lax.stop_gradient(jnp.clip(iou_ref, 0, 1)) * pos_f
        onehot = jax.nn.one_hot(labels, self.num_classes)
        vfl_target = onehot * q[..., None]
        loss_cls_fn = LOSSES.build(dict(
            self.loss_cls or dict(type="VarifocalLoss", use_sigmoid=True,
                                  alpha=0.75, gamma=2.0, iou_weighted=True,
                                  loss_weight=1.0)))
        loss_cls = loss_cls_fn(cls_cat.reshape(-1, self.num_classes),
                               vfl_target.reshape(-1, self.num_classes),
                               avg_factor=num_pos)

        loss_bbox_fn = LOSSES.build(dict(
            self.loss_bbox or dict(type="GIoULoss", loss_weight=1.5)))
        loss_ref_fn = LOSSES.build(dict(
            self.loss_bbox_refine or dict(type="GIoULoss", loss_weight=2.0)))
        w_init = jax.lax.stop_gradient(jnp.clip(iou_init, 0, 1)) * pos_f
        w_ref = q
        loss_bbox = loss_bbox_fn(
            boxes_init.reshape(-1, 4), gb.reshape(-1, 4),
            weight=w_init.reshape(-1),
            avg_factor=jnp.maximum(w_init.sum(), 1e-6))
        loss_refine = loss_ref_fn(
            boxes_ref.reshape(-1, 4), gb.reshape(-1, 4),
            weight=w_ref.reshape(-1),
            avg_factor=jnp.maximum(w_ref.sum(), 1e-6))
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "loss_bbox_rf": loss_refine, "num_pos": num_pos}

    # ------------------------------------------------------------ inference
    def get_bboxes(self, cls_outs, init_outs, refine_outs, img_shapes,
                   pad_shape, scale_factors=None,
                   rescale: bool = False) -> DetResult:
        cfg = self.test_cfg or {}
        nms_pre = int(cfg.get("nms_pre", 1000))
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg.get("nms", {}).get("iou_threshold", 0.6))
        max_per_img = int(cfg.get("max_per_img", 100))
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        b = cls_outs[0].shape[0]
        lvl_pts = []
        for (h, w), s in zip(featmap_sizes, self.strides):
            xs = (np.arange(w) * s + s / 2).astype(np.float32)
            ys = (np.arange(h) * s + s / 2).astype(np.float32)
            xx, yy = np.meshgrid(xs, ys)
            lvl_pts.append(np.stack([xx.ravel(), yy.ravel()], -1))
        cls_levels = [c.reshape(b, -1, self.num_classes) for c in cls_outs]
        ref_levels = [r.reshape(b, -1, 4) for r in refine_outs]

        def single(cls_list, ref_list, img_shape, scale_factor):
            boxes_all, scores_all = [], []
            for lvl in range(len(cls_list)):
                sc = jax.nn.sigmoid(cls_list[lvl])
                rank = jnp.max(sc, -1)
                k = min(nms_pre, sc.shape[0]) if nms_pre > 0 else sc.shape[0]
                _, idx = jax.lax.top_k(rank, k)
                boxes = distance2bbox(jnp.asarray(lvl_pts[lvl])[idx],
                                      ref_list[lvl][idx])
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

        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        dets = jax.vmap(single)(cls_levels, ref_levels, img_shapes, sf)
        return dets, None
