"""RepPointsHead — point-set single-stage detector.

Parity target: mmdet models/dense_heads/reppoints_head.py:764.
Behavioral spec re-derived from the reference:
- two-stage point prediction: init offsets from a conv stack; the refine and
  cls branches read features through a 3x3 *deformable* conv whose offsets
  are the (gradient-attenuated, gradient_mul=0.1) init points minus the base
  kernel grid (:254-294);
- points2bbox via minmax / partial_minmax / moment (learnable
  moment_transfer with the moment_mul gradient trick, :166-216);
- init-stage targets from PointAssigner (per-gt level by log2 size, nearest
  pos_num points win, closest-gt tie-break — core/bbox/assigners/
  point_assigner.py), refine-stage targets from MaxIoU on init-decoded
  boxes shifted to centers (:569-640);
- losses: focal cls (refine norm), SmoothL1 on points2bbox outputs
  normalized by point_base_scale*stride (:531-567).

TPU design: the CUDA DeformConv2d becomes bilinear gather at the 9 predicted
sample points + a 1x1 conv over the stacked 9C channels — mathematically the
same operator, expressed as XLA gathers + one MXU matmul. Offsets keep the
reference's (y, x) channel order.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.assigners import MaxIoUAssigner
from ...core.post_processing import DetResult, multiclass_nms
from ...utils.registry import HEADS, LOSSES
from ...ops.gather import take_rows
from ..utils import ConvModule, bias_init_with_prob

__all__ = ["RepPointsHead", "point_assign"]


def point_assign(points: jnp.ndarray, strides: np.ndarray,
                 gt_bboxes: jnp.ndarray, gt_valid: jnp.ndarray,
                 scale: float = 4.0, pos_num: int = 1) -> jnp.ndarray:
    """Vectorized PointAssigner (reference point_assigner.py:9-134).

    points (N, 2), strides (N,) static; gt (G, 4) padded.
    Returns assigned (N,) int32: 0 bg, j+1 -> gt j.
    """
    pts_lvl = jnp.asarray(np.log2(strides).astype(np.int32))
    lvl_min, lvl_max = int(np.log2(strides.min())), int(np.log2(strides.max()))
    gt_xy = (gt_bboxes[:, :2] + gt_bboxes[:, 2:]) / 2
    gt_wh = jnp.clip(gt_bboxes[:, 2:] - gt_bboxes[:, :2], 1e-6, None)
    gt_lvl = ((jnp.log2(gt_wh[:, 0] / scale)
               + jnp.log2(gt_wh[:, 1] / scale)) / 2).astype(jnp.int32)
    gt_lvl = jnp.clip(gt_lvl, lvl_min, lvl_max)

    dist = jnp.linalg.norm(
        (points[:, None, :] - gt_xy[None, :, :]) / gt_wh[None, :, :],
        axis=-1)                                            # (N, G)
    lvl_ok = pts_lvl[:, None] == gt_lvl[None, :]
    dist = jnp.where(lvl_ok & gt_valid[None, :], dist, jnp.inf)
    # candidate: among pos_num smallest of each gt column
    kth = -jax.lax.top_k(-dist.T, pos_num)[0][:, -1]        # (G,) kth smallest
    cand = dist <= kth[None, :]
    masked = jnp.where(cand, dist, jnp.inf)
    best = jnp.min(masked, axis=1)
    assigned = jnp.where(jnp.isfinite(best),
                         jnp.argmin(masked, axis=1).astype(jnp.int32) + 1, 0)
    return assigned


@HEADS.register_module()
class RepPointsHead(nn.Module):
    num_classes: int
    in_channels: int
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_points: int = 9
    gradient_mul: float = 0.1
    point_base_scale: int = 4
    point_strides: Sequence[int] = (8, 16, 32, 64, 128)
    transform_method: str = "moment"
    moment_mul: float = 0.01
    norm_cfg: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox_init: Optional[dict] = None
    loss_bbox_refine: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @property
    def dcn_kernel(self) -> int:
        k = int(np.sqrt(self.num_points))
        assert k * k == self.num_points
        return k

    def _dcn_base_offset(self) -> np.ndarray:
        """(K, 2) base 3x3 grid offsets in (y, x) order (reference :106-117)."""
        k = self.dcn_kernel
        pad = (k - 1) // 2
        yy, xx = np.meshgrid(np.arange(-pad, pad + 1),
                             np.arange(-pad, pad + 1), indexing="ij")
        return np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float32)

    # ------------------------------------------------------------- network
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
        pts_init_conv = nn.Conv(self.point_feat_channels, (3, 3), padding=1,
                                dtype=self.dtype, name="pts_init_conv")
        pts_init_out = nn.Conv(2 * self.num_points, (1, 1), dtype=self.dtype,
                               kernel_init=nn.initializers.normal(0.01),
                               name="pts_init_out")
        # deformable convs become: gather K samples -> 1x1 conv over K*C
        cls_dcn_w = nn.Conv(self.point_feat_channels, (1, 1),
                            dtype=self.dtype, name="cls_dcn")
        cls_out_conv = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                               kernel_init=nn.initializers.normal(0.01),
                               bias_init=nn.initializers.constant(
                                   bias_init_with_prob(0.01)),
                               name="cls_out")
        refine_dcn_w = nn.Conv(self.point_feat_channels, (1, 1),
                               dtype=self.dtype, name="refine_dcn")
        pts_refine_out = nn.Conv(2 * self.num_points, (1, 1),
                                 kernel_init=nn.initializers.normal(0.01),
                                 dtype=self.dtype, name="pts_refine_out")
        moment_transfer = self.param(
            "moment_transfer", nn.initializers.zeros, (2,)) \
            if self.transform_method == "moment" else None

        base_off = self._dcn_base_offset()  # (K, 2) yx

        def deform_gather(feat, sample_pts_yx):
            """feat (B,H,W,C); sample_pts_yx (B,H,W,K,2) offsets in feature
            cells relative to each position -> (B,H,W,K*C)."""
            b, h, w, c = feat.shape
            gy = jnp.arange(h, dtype=feat.dtype)[None, :, None, None]
            gx = jnp.arange(w, dtype=feat.dtype)[None, None, :, None]
            sy = gy + sample_pts_yx[..., 0]
            sx = gx + sample_pts_yx[..., 1]
            pts = jnp.stack([sx, sy], -1).reshape(b, h * w * self.num_points, 2)
            from ...ops.grid_sample import point_sample_pixel
            out = point_sample_pixel(feat, pts, padding_mode="zeros")
            return out.reshape(b, h, w, self.num_points * c)

        cls_outs, init_outs, refine_outs = [], [], []
        for f in feats:
            cf, rf = f, f
            for conv in cls_convs:
                cf = conv(cf, train=train)
            for conv in reg_convs:
                rf = conv(rf, train=train)
            pts_init = pts_init_out(nn.relu(pts_init_conv(rf)))  # (B,H,W,2K) yx
            b, h, w, _ = pts_init.shape
            pts_init_gm = ((1 - self.gradient_mul)
                           * jax.lax.stop_gradient(pts_init)
                           + self.gradient_mul * pts_init)
            sample_yx = pts_init_gm.reshape(b, h, w, self.num_points, 2)
            cls_feat_d = deform_gather(cf, sample_yx)
            cls_outs.append(cls_out_conv(nn.relu(cls_dcn_w(cls_feat_d))))
            ref_feat_d = deform_gather(rf, sample_yx)
            pts_refine = pts_refine_out(nn.relu(refine_dcn_w(ref_feat_d)))
            pts_refine = pts_refine + jax.lax.stop_gradient(pts_init)
            init_outs.append(pts_init)
            refine_outs.append(pts_refine)
        return cls_outs, init_outs, refine_outs, moment_transfer

    # --------------------------------------------------------------- decode
    def points2bbox(self, pts_xy: jnp.ndarray,
                    moment_transfer: Optional[jnp.ndarray]) -> jnp.ndarray:
        """pts_xy (..., 2K) in xy order -> (..., 4) xyxy."""
        shape = pts_xy.shape[:-1]
        pts = pts_xy.reshape(*shape, self.num_points, 2)
        x, y = pts[..., 0], pts[..., 1]
        if self.transform_method == "minmax":
            return jnp.stack([x.min(-1), y.min(-1), x.max(-1), y.max(-1)], -1)
        if self.transform_method == "partial_minmax":
            x4, y4 = x[..., :4], y[..., :4]
            return jnp.stack([x4.min(-1), y4.min(-1),
                              x4.max(-1), y4.max(-1)], -1)
        if self.transform_method == "moment":
            xm = x.mean(-1)
            ym = y.mean(-1)
            xs = jnp.std(x - xm[..., None], axis=-1)
            ys = jnp.std(y - ym[..., None], axis=-1)
            mt = (moment_transfer * self.moment_mul
                  + jax.lax.stop_gradient(moment_transfer)
                  * (1 - self.moment_mul))
            hw = xs * jnp.exp(mt[0])
            hh = ys * jnp.exp(mt[1])
            return jnp.stack([xm - hw, ym - hh, xm + hw, ym + hh], -1)
        raise ValueError(self.transform_method)

    def flat_points(self, featmap_sizes):
        pts, strides = [], []
        for (h, w), s in zip(featmap_sizes, self.point_strides):
            xs = (np.arange(w) * s + s // 2).astype(np.float32)
            ys = (np.arange(h) * s + s // 2).astype(np.float32)
            xx, yy = np.meshgrid(xs, ys)
            pts.append(np.stack([xx.ravel(), yy.ravel()], -1))
            strides.append(np.full((h * w,), s, np.float32))
        return np.concatenate(pts), np.concatenate(strides)

    def _yx_to_xy_coords(self, pts_out: jnp.ndarray, centers: np.ndarray,
                         strides: np.ndarray) -> jnp.ndarray:
        """(B, N, 2K) yx offsets -> absolute xy coords (offset_to_pts)."""
        b, n, _ = pts_out.shape
        o = pts_out.reshape(b, n, self.num_points, 2)
        xy = jnp.stack([o[..., 1], o[..., 0]], -1)  # -> xy
        abs_xy = xy * strides[None, :, None, None] + centers[None, :, None, :]
        return abs_xy.reshape(b, n, 2 * self.num_points)

    # ---------------------------------------------------------------- loss
    def loss(self, cls_outs, init_outs, refine_outs, moment_transfer,
             batch: Dict[str, Any], rng=None) -> Dict[str, jnp.ndarray]:
        tc = dict(self.train_cfg or {})
        init_cfg = dict(tc.get("init", dict(
            assigner=dict(type="PointAssigner", scale=4, pos_num=1),
            pos_weight=-1)))
        refine_cfg = dict(tc.get("refine", dict(
            assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                          neg_iou_thr=0.4, min_pos_iou=0, ignore_iof_thr=-1),
            pos_weight=-1)))

        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        centers, strides = self.flat_points(featmap_sizes)
        b = cls_outs[0].shape[0]
        cls_cat = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes) for c in cls_outs], 1)
        init_cat = jnp.concatenate(
            [p.reshape(b, -1, 2 * self.num_points) for p in init_outs], 1)
        refine_cat = jnp.concatenate(
            [p.reshape(b, -1, 2 * self.num_points) for p in refine_outs], 1)

        init_xy = self._yx_to_xy_coords(init_cat, centers, strides)
        refine_xy = self._yx_to_xy_coords(refine_cat, centers, strides)

        # ---- init-stage targets: PointAssigner on centers
        ia = dict(init_cfg["assigner"])
        scale = float(ia.get("scale", 4))
        pos_num = int(ia.get("pos_num", 1))

        def init_single(gtb, gv):
            assigned = point_assign(jnp.asarray(centers),
                                    strides, gtb, gv, scale, pos_num)
            pos = assigned > 0
            safe = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
            return take_rows(gtb, safe), pos

        gt_init, pos_init = jax.vmap(init_single)(batch["gt_bboxes"],
                                                  batch["gt_valid"])
        num_init = jnp.maximum(
            jnp.maximum(pos_init.sum(1), 1).sum().astype(jnp.float32), 1.0)

        # ---- refine-stage targets: MaxIoU on init-decoded boxes (shifted to
        # their grid centers, reference :612-627)
        # reference uses points2bbox on raw yx preds with y_first=True, then
        # scales by stride and shifts by center:
        o = jax.lax.stop_gradient(init_cat).reshape(b, -1, self.num_points, 2)
        xy_rel = jnp.stack([o[..., 1], o[..., 0]], -1).reshape(
            b, -1, 2 * self.num_points)
        rel_box = self.points2bbox(xy_rel, moment_transfer)  # (B, N, 4)
        ctr4 = np.concatenate([centers, centers], -1)
        cand_boxes = rel_box * strides[None, :, None] + ctr4[None]

        ra = dict(refine_cfg["assigner"])
        ra.pop("type", None)
        refine_assigner = MaxIoUAssigner(**ra)

        def refine_single(cand, gtb, gtl, gv):
            assigned, _, labels = refine_assigner.assign(cand, gtb, gv, gtl)
            pos = assigned > 0
            neg = assigned == 0
            safe = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
            out_labels = jnp.where(pos, labels, self.num_classes)
            lw = pos.astype(jnp.float32) + neg.astype(jnp.float32)
            return take_rows(gtb, safe), pos, out_labels, lw

        gt_refine, pos_refine, labels, label_weights = jax.vmap(
            refine_single)(cand_boxes, batch["gt_bboxes"],
                           batch["gt_labels"], batch["gt_valid"])
        num_refine = jnp.maximum(
            jnp.maximum(pos_refine.sum(1), 1).sum().astype(jnp.float32), 1.0)

        # ---- losses
        loss_cls_fn = LOSSES.build(dict(
            self.loss_cls or dict(type="FocalLoss", use_sigmoid=True,
                                  gamma=2.0, alpha=0.25, loss_weight=1.0)))
        loss_cls = loss_cls_fn(cls_cat.reshape(-1, self.num_classes),
                               labels.reshape(-1),
                               weight=label_weights.reshape(-1),
                               avg_factor=num_refine)

        norm_term = self.point_base_scale * strides  # (N,)
        norm4 = norm_term[None, :, None]
        pred_box_init = self.points2bbox(init_xy, moment_transfer)
        pred_box_refine = self.points2bbox(refine_xy, moment_transfer)
        li = LOSSES.build(dict(
            self.loss_bbox_init or dict(type="SmoothL1Loss", beta=0.11,
                                        loss_weight=0.5)))
        lr = LOSSES.build(dict(
            self.loss_bbox_refine or dict(type="SmoothL1Loss", beta=0.11,
                                          loss_weight=1.0)))
        loss_pts_init = li(pred_box_init / norm4, gt_init / norm4,
                           weight=pos_init.astype(jnp.float32)[..., None],
                           avg_factor=num_init)
        loss_pts_refine = lr(pred_box_refine / norm4, gt_refine / norm4,
                             weight=pos_refine.astype(jnp.float32)[..., None],
                             avg_factor=num_refine)
        return {"loss_cls": loss_cls, "loss_pts_init": loss_pts_init,
                "loss_pts_refine": loss_pts_refine,
                "num_pos": pos_refine.sum()}

    # ------------------------------------------------------------ inference
    def get_bboxes(self, cls_outs, init_outs, refine_outs, moment_transfer,
                   img_shapes, pad_shape, scale_factors=None,
                   rescale: bool = False) -> DetResult:
        cfg = self.test_cfg or {}
        nms_pre = int(cfg.get("nms_pre", 1000))
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg.get("nms", {}).get("iou_threshold", 0.5))
        max_per_img = int(cfg.get("max_per_img", 100))
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        b = cls_outs[0].shape[0]

        level_data = []
        for lvl, ((h, w), s) in enumerate(zip(featmap_sizes,
                                              self.point_strides)):
            xs = (np.arange(w) * s + s // 2).astype(np.float32)
            ys = (np.arange(h) * s + s // 2).astype(np.float32)
            xx, yy = np.meshgrid(xs, ys)
            ctr = np.stack([xx.ravel(), yy.ravel()], -1)
            level_data.append((ctr, float(s)))

        cls_levels = [c.reshape(b, -1, self.num_classes) for c in cls_outs]
        pts_levels = [p.reshape(b, -1, 2 * self.num_points)
                      for p in refine_outs]

        def single(cls_list, pts_list, img_shape, scale_factor):
            boxes_all, scores_all = [], []
            for lvl in range(len(cls_list)):
                ctr, s = level_data[lvl]
                sc = jax.nn.sigmoid(cls_list[lvl])
                max_s = jnp.max(sc, -1)
                k = min(nms_pre, sc.shape[0]) if nms_pre > 0 else sc.shape[0]
                _, idx = jax.lax.top_k(max_s, k)
                o = pts_list[lvl][idx].reshape(k, self.num_points, 2)
                xy = jnp.stack([o[..., 1], o[..., 0]], -1).reshape(
                    k, 2 * self.num_points)
                rel_box = self.points2bbox(xy, moment_transfer)
                boxes = rel_box * s + jnp.asarray(
                    np.concatenate([ctr, ctr], -1))[idx]
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
        dets = jax.vmap(single)(cls_levels, pts_levels, img_shapes, sf)
        return dets, None
