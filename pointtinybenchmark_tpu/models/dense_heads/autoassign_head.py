"""AutoAssignHead — fully differentiable label assignment.

Parity target: mmdet models/dense_heads/autoassign_head.py — FCOS tower
with an objectness branch, a learnable per-class Gaussian center prior,
confidence-weighted positive bag loss
(-log sum_i w_i · P_i with P = P_cls · P_obj · exp(-5(1-GIoU))), and a
negative loss down-weighted by each location's best decoded IoU
(w_neg = 1 - normalized 1/(1-iou) inside boxes).

TPU design: all per-gt host loops become one (B, N, G) masked tensor
program; the center prior parameters live in the flax param tree like any
weight and train end-to-end.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.bbox import distance2bbox
from ...ops.iou import bbox_overlaps
from ...utils.registry import HEADS
from ..utils import ConvModule, bias_init_with_prob
from .fcos_head import Scale

__all__ = ["AutoAssignHead"]

EPS = 1e-12


@HEADS.register_module()
class AutoAssignHead(nn.Module):
    num_classes: int
    in_channels: int
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    pos_loss_weight: float = 0.25
    neg_loss_weight: float = 0.75
    center_loss_weight: float = 0.75
    temperature: float = 3.0
    norm_cfg: Optional[dict] = None
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
        conv_obj = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name="conv_objectness")
        scales = [Scale(name=f"scale{i}") for i in range(len(self.strides))]
        # learnable center prior (mmdet CenterPrior: mean/sigma per class)
        mu = self.param("center_prior_mean",
                        nn.initializers.zeros, (self.num_classes, 2))
        sigma = self.param("center_prior_sigma",
                           nn.initializers.ones, (self.num_classes, 2))

        cls_outs, reg_outs, obj_outs = [], [], []
        for i, f in enumerate(feats):
            cf, rf = f, f
            for conv in cls_convs:
                cf = conv(cf, train=train)
            for conv in reg_convs:
                rf = conv(rf, train=train)
            cls_outs.append(conv_cls(cf))
            obj_outs.append(conv_obj(cf))
            reg = nn.relu(scales[i](conv_reg(rf))) * self.strides[i]
            reg_outs.append(reg)
        return cls_outs, reg_outs, obj_outs, (mu, sigma)

    # -------------------------------------------------------------- points
    def flat_points(self, featmap_sizes):
        pts, strides = [], []
        for (h, w), s in zip(featmap_sizes, self.strides):
            xs = (np.arange(w) * s + s / 2).astype(np.float32)
            ys = (np.arange(h) * s + s / 2).astype(np.float32)
            xx, yy = np.meshgrid(xs, ys)
            p = np.stack([xx.ravel(), yy.ravel()], -1)
            pts.append(p)
            strides.append(np.full((len(p),), s, np.float32))
        return np.concatenate(pts), np.concatenate(strides)

    # ---------------------------------------------------------------- loss
    def loss(self, cls_outs, reg_outs, obj_outs, prior, batch: Dict[str, Any],
             rng=None) -> Dict[str, jnp.ndarray]:
        mu, sigma = prior
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        points, strides = self.flat_points(featmap_sizes)
        pts = jnp.asarray(points)
        st = jnp.asarray(strides)
        b = cls_outs[0].shape[0]
        cls_cat = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes) for c in cls_outs], 1)
        reg_cat = jnp.concatenate([r.reshape(b, -1, 4) for r in reg_outs], 1)
        obj_cat = jnp.concatenate([o.reshape(b, -1) for o in obj_outs], 1)

        def single(cls_s, reg_s, obj_s, gtb, gtl, gv):
            n = pts.shape[0]
            g = gtb.shape[0]
            decoded = distance2bbox(pts, reg_s)                  # (N, 4)
            inside = ((pts[:, None, 0] > gtb[None, :, 0])
                      & (pts[:, None, 0] < gtb[None, :, 2])
                      & (pts[:, None, 1] > gtb[None, :, 1])
                      & (pts[:, None, 1] < gtb[None, :, 3])
                      & gv[None, :])                             # (N, G)
            # learnable gaussian center prior
            gcx = (gtb[:, 0] + gtb[:, 2]) / 2
            gcy = (gtb[:, 1] + gtb[:, 3]) / 2
            safe_l = jnp.clip(gtl, 0, self.num_classes - 1)
            d = jnp.stack([pts[:, None, 0] - gcx[None],
                           pts[:, None, 1] - gcy[None]], -1) \
                / st[:, None, None]                              # (N, G, 2)
            z = (d - mu[safe_l][None]) / (sigma[safe_l][None] + EPS)
            prior_w = jnp.exp(-0.5 * (z ** 2).sum(-1)) * inside  # (N, G)

            p_cls = jax.nn.sigmoid(cls_s)[:, safe_l]             # (N, G)
            p_obj = jax.nn.sigmoid(obj_s)[:, None]               # (N, 1)
            ious = bbox_overlaps(decoded, gtb, mode="giou")      # (N, G)
            p_loc = jnp.exp(-5.0 * (1.0 - ious))
            p_pos = p_cls * p_obj * p_loc                        # (N, G)

            # confidence weighting over each gt's bag
            logits = jnp.where(inside,
                               p_pos * self.temperature, -1e9)
            w = jax.nn.softmax(logits, axis=0)
            w = jnp.where(inside, w * prior_w, 0.0)
            w = w / jnp.maximum(w.sum(0, keepdims=True), EPS)
            bag_p = (w * p_pos).sum(0)                           # (G,)
            pos_loss = -jnp.log(jnp.clip(bag_p, EPS, 1.0)) * gv
            num_gt = jnp.maximum(gv.sum(), 1.0)
            pos_loss = pos_loss.sum() / num_gt

            # negative loss: joint confidence suppressed by best IoU
            iou_plain = jax.lax.stop_gradient(
                bbox_overlaps(decoded, gtb))                     # (N, G)
            tw = jnp.where(inside, 1.0 / (1.0 - jnp.clip(
                iou_plain, 0.0, 0.99)), 0.0)
            tmax = jnp.max(tw, 0, keepdims=True)
            tmin = jnp.min(jnp.where(inside, tw, jnp.inf), 0,
                           keepdims=True)
            norm_t = jnp.where(inside,
                               (tw - tmin) / jnp.maximum(tmax - tmin, EPS),
                               0.0)
            # per (point, class) down-weight from the best matching gt
            onehot = jax.nn.one_hot(safe_l, self.num_classes) \
                * gv[:, None]                                    # (G, C)
            w_fg = jnp.einsum("ng,gc->nc", norm_t, onehot)
            w_fg = jnp.clip(w_fg, 0.0, 1.0)
            joint = p_cls_full = jax.nn.sigmoid(cls_s) * p_obj   # (N, C)
            neg_p = joint * (1.0 - w_fg)
            neg_loss = (neg_p ** 2
                        * -jnp.log(jnp.clip(1.0 - neg_p, EPS, 1.0))).sum()
            neg_loss = neg_loss / jnp.maximum(inside.sum(), 1.0)
            del p_cls_full

            # center prior regularizer: keep prior mass on each gt's bag
            cw_loss = -jnp.log(jnp.clip(
                (prior_w / jnp.maximum(prior_w.sum(0, keepdims=True), EPS)
                 * jnp.where(inside, p_pos, 0.0)).sum(0), EPS, 1.0)) * gv
            cw_loss = cw_loss.sum() / num_gt
            return pos_loss, neg_loss, cw_loss, inside.sum()

        pos_l, neg_l, cen_l, npos = jax.vmap(single)(
            cls_cat, reg_cat, obj_cat, batch["gt_bboxes"],
            batch["gt_labels"], batch["gt_valid"])
        return {"loss_pos": self.pos_loss_weight * pos_l.mean(),
                "loss_neg": self.neg_loss_weight * neg_l.mean(),
                "loss_center": self.center_loss_weight * cen_l.mean(),
                "num_pos": npos.sum().astype(jnp.float32)}

    # ------------------------------------------------------------ inference
    def get_bboxes(self, cls_outs, reg_outs, obj_outs, prior, img_shapes,
                   pad_shape, scale_factors=None, rescale: bool = False):
        from ...core.post_processing import multiclass_nms
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
        cls_l = [c.reshape(b, -1, self.num_classes) for c in cls_outs]
        reg_l = [r.reshape(b, -1, 4) for r in reg_outs]
        obj_l = [o.reshape(b, -1) for o in obj_outs]

        def single(cls_list, reg_list, obj_list, img_shape, scale_factor):
            boxes_all, scores_all = [], []
            for lvl in range(len(cls_list)):
                sc = jax.nn.sigmoid(cls_list[lvl]) \
                    * jax.nn.sigmoid(obj_list[lvl])[:, None]
                rank = jnp.max(sc, -1)
                k = min(nms_pre, sc.shape[0]) if nms_pre > 0 else sc.shape[0]
                _, idx = jax.lax.top_k(rank, k)
                boxes = distance2bbox(jnp.asarray(lvl_pts[lvl])[idx],
                                      reg_list[lvl][idx])
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
        dets = jax.vmap(single)(cls_l, reg_l, obj_l, img_shapes, sf)
        return dets, None
