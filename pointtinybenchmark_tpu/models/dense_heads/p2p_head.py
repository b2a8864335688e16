"""P2PHead — P2PNet-style multi-class point predictor, TPU-native.

Parity target: fork models/point/dense_heads/p2p_head.py:19-629.
Behavioral spec re-derived from the reference:
- per-level cls conv (K*num_cls_out ch) + reg conv (K*2 ch) over stacked
  convs (:82-102);
- decode `pred = anchor_pt + offset * pts_gamma * stride` over K point
  anchors per cell (:125-170);
- targets via HungarianAssignerV2 (FocalLossCost + DisCostV2, topk_k) on
  predicted (or anchor) points (:185-195, :275-306);
- losses: focal/CE cls (avg by num_pos for focal, by num_total for CE) +
  SmoothL1/MSE on stride- and reg_norm-normalized coords (:220-248);
- test: per-level topk -> clamp -> pseudo-box NMS -> (cx, cy, score)
  (:330-423).

TPU design: one fused batched pass — all levels concatenated to a static
N = sum(H*W*K); gt padded to (G,) with validity masks; Hungarian replaced by
the in-graph auction matcher (core/assigners.py) so the whole train step
stays on-device (the reference hops to CPU scipy per image).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.anchors import PointGenerator
from ...core.assigners import HungarianAssignerV2
from ...core.post_processing import DetResult, multiclass_nms
from ...utils.registry import HEADS, LOSSES
from ...ops.gather import take_rows
from ..utils import ConvModule, bias_init_with_prob

__all__ = ["P2PHead"]


@HEADS.register_module()
class P2PHead(nn.Module):
    num_classes: int
    in_channels: int
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (4,)
    point_anchor: Sequence[Tuple[float, float]] = ((0.0, 0.0),)
    assign_before_pred: bool = False
    pts_gamma: float = 1.0
    reg_norm: float = 1.0
    norm_cfg: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_reg: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @property
    def num_points(self) -> int:
        return len(self.point_anchor)

    @property
    def use_sigmoid_cls(self) -> bool:
        lc = self.loss_cls or dict(type="CrossEntropyLoss", use_sigmoid=True)
        return bool(lc.get("use_sigmoid", False))

    @property
    def num_cls_out(self) -> int:
        return self.num_classes if self.use_sigmoid_cls else self.num_classes + 1

    # ------------------------------------------------------------- network
    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        """feats: per-level (B, H, W, C) -> per-level (cls_out, pts_out)."""
        norm = (self.norm_cfg or {}).get("type") if self.norm_cfg else None
        ngroups = (self.norm_cfg or {}).get("num_groups", 32)
        cls_convs = [ConvModule(self.feat_channels, 3, norm=norm,
                                num_groups=ngroups, dtype=self.dtype,
                                name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [ConvModule(self.feat_channels, 3, norm=norm,
                                num_groups=ngroups, dtype=self.dtype,
                                name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        cls_out_conv = nn.Conv(self.num_cls_out * self.num_points, (3, 3),
                               padding=1, dtype=self.dtype,
                               bias_init=nn.initializers.constant(
                                   bias_init_with_prob(0.01)),
                               kernel_init=nn.initializers.normal(0.01),
                               name="cls_out")
        reg_out_conv = nn.Conv(self.num_points * 2, (3, 3), padding=1,
                               kernel_init=nn.initializers.normal(0.01),
                               dtype=self.dtype, name="reg_out")
        cls_outs, pts_outs = [], []
        for feat in feats:
            cf, rf = feat, feat
            for conv in cls_convs:
                cf = conv(cf, train=train)
            for conv in reg_convs:
                rf = conv(rf, train=train)
            cls_outs.append(cls_out_conv(cf))
            pts_outs.append(reg_out_conv(rf))
        return cls_outs, pts_outs

    # --------------------------------------------------------- pure logic
    def get_points(self, featmap_sizes: Sequence[Tuple[int, int]],
                   pad_shape: Tuple[int, int]):
        """Anchor points over all levels, K anchors per cell.

        Returns anchor_pts (N, 3) = (x, y, stride) and valid (N,) where
        N = sum_l H_l*W_l*K. Host-side (trace-time constants).
        """
        gen = PointGenerator()
        pts_list, valid_list = [], []
        for (h, w), stride in zip(featmap_sizes, self.strides):
            base = gen.grid_points((h, w), stride)                   # (HW, 3)
            offs = np.asarray(self.point_anchor, np.float32) * stride  # (K, 2)
            pts = np.repeat(base[:, None, :], self.num_points, axis=1)
            pts[..., :2] += offs[None, :, :]
            pts_list.append(pts.reshape(-1, 3))
            vh = min(int(np.ceil(pad_shape[0] / stride)), h)
            vw = min(int(np.ceil(pad_shape[1] / stride)), w)
            v = gen.valid_flags((h, w), (vh, vw))
            valid_list.append(np.repeat(v, self.num_points))
        # numpy on purpose: constants under jit (see core/anchors.py note)
        return (np.concatenate(pts_list).astype(np.float32),
                np.concatenate(valid_list))

    def decode_points(self, cls_outs: List[jnp.ndarray],
                      pts_outs: List[jnp.ndarray],
                      pad_shape: Tuple[int, int]):
        """Flatten levels and decode predictions.

        Returns:
            anchor_pts (N, 3), pred_pts (B, N, 3), valid (N,),
            cls_scores (B, N, num_cls_out)
        """
        b = cls_outs[0].shape[0]
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        anchor_pts, valid = self.get_points(featmap_sizes, pad_shape)
        cls_cat = jnp.concatenate(
            [c.reshape(b, -1, self.num_cls_out) for c in cls_outs], axis=1)
        pts_cat = jnp.concatenate(
            [p.reshape(b, -1, 2) for p in pts_outs], axis=1)      # (B, N, 2)
        stride = anchor_pts[None, :, 2:3]
        pred_xy = anchor_pts[None, :, :2] + pts_cat * self.pts_gamma * stride
        pred_pts = jnp.concatenate(
            [pred_xy, jnp.broadcast_to(stride, (b,) + stride.shape[1:])], -1)
        return anchor_pts, pred_pts, valid, cls_cat

    def build_assigner(self) -> HungarianAssignerV2:
        cfg = dict(self.train_cfg["assigner"])
        cfg.pop("type", None)
        return HungarianAssignerV2(**cfg)

    def loss(self, cls_outs, pts_outs, batch: Dict[str, jnp.ndarray],
             rng=None):
        """Compute losses for a padded batch.

        batch keys: gt_bboxes (B, G, 4), gt_labels (B, G), gt_valid (B, G),
        img_shape (B, 2+) [h, w], pad_shape tuple (static).
        """
        pad_shape = batch["pad_shape"]
        anchor_pts, pred_pts, valid, cls_cat = self.decode_points(
            cls_outs, pts_outs, pad_shape)
        b, n = pred_pts.shape[:2]

        gt_points = (batch["gt_bboxes"][..., :2] + batch["gt_bboxes"][..., 2:]) / 2
        gt_labels = batch["gt_labels"]
        gt_valid = batch["gt_valid"]

        proposals = anchor_pts[None, :, :2].repeat(b, 0) if self.assign_before_pred \
            else pred_pts[..., :2]

        assigner = self.build_assigner()

        def cost_one(props, cls_pred, gpts, glab, gv, shape):
            meta = {"img_shape": shape}
            c = assigner.cost_matrix(props, cls_pred, gpts, glab, meta, gv)
            # invalid (outside) predictions can never match
            return jnp.where(valid[:, None], c, 1e8)

        cost = jax.vmap(cost_one)(proposals, cls_cat, gt_points, gt_labels,
                                  gt_valid, batch["img_shape"])
        from ...core.assigners import topk_auction_match
        assigned = topk_auction_match(cost, gt_valid, assigner.topk_k)  # (B, N)

        pos = assigned > 0
        safe = jnp.clip(assigned - 1, 0, gt_points.shape[1] - 1)
        labels = jnp.where(pos, take_rows(gt_labels, safe),
                           self.num_classes)
        target_pts = take_rows(gt_points, safe)
        pos_weight = float(self.train_cfg.get("pos_weight", 1.0))
        neg_weight = float(self.train_cfg.get("neg_weight", 1.0))
        label_weights = jnp.where(pos, pos_weight, neg_weight)
        label_weights = jnp.where(valid[None, :], label_weights, 0.0)
        pts_weights = (pos & valid[None, :]).astype(jnp.float32)

        num_total_pos = jnp.maximum(pts_weights.sum(), 1.0)
        num_total = float(b * n)

        loss_cls_builder = LOSSES.build(dict(self.loss_cls))
        cls_avg = num_total if dict(self.loss_cls)["type"] == "CrossEntropyLoss" \
            else num_total_pos
        loss_cls = loss_cls_builder(
            cls_cat.reshape(b * n, -1), labels.reshape(-1),
            weight=label_weights.reshape(-1), avg_factor=cls_avg)

        loss_reg_builder = LOSSES.build(dict(self.loss_reg))
        stride = pred_pts[..., 2:3]
        norm = stride * self.reg_norm
        loss_pts = loss_reg_builder(
            pred_pts[..., :2] / norm, target_pts / norm,
            weight=pts_weights[..., None], avg_factor=num_total_pos)

        return {"loss_cls": loss_cls, "loss_pts": loss_pts,
                "num_pos": num_total_pos}

    def get_bboxes(self, cls_outs, pts_outs, img_shapes, pad_shape,
                   scale_factors=None, rescale: bool = False) -> DetResult:
        """Batched inference. Returns DetResult with bboxes (B, max, 5) in
        (cx, cy, 0, 0, score) convention? No — matches the reference's final
        output: center (cx, cy) + score; we return pseudo boxes + points.

        img_shapes: (B, 2) [h, w]; scale_factors: (B, 4) or None.
        """
        cfg = self.test_cfg
        b = cls_outs[0].shape[0]
        nms_pre = int(cfg.get("nms_pre", 1000))
        pseudo_wh = tuple(cfg.get("pseudo_wh", (16, 16)))
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg["nms"]["iou_threshold"])
        max_per_img = int(cfg.get("max_per_img", 100))

        # per-level topk then concat (static shapes)
        level_sizes = [c.shape[1] * c.shape[2] * self.num_points
                       for c in cls_outs]
        anchor_pts, pred_pts, valid, cls_cat = self.decode_points(
            cls_outs, pts_outs, pad_shape)
        if self.use_sigmoid_cls:
            scores_all = jax.nn.sigmoid(cls_cat)
        else:
            scores_all = jax.nn.softmax(cls_cat, axis=-1)

        def single(pred_xy, sc, vld, img_shape, scale_factor):
            pts_list, sc_list = [], []
            start = 0
            for ls in level_sizes:
                s = sc[start:start + ls]
                p = pred_xy[start:start + ls]
                v = vld[start:start + ls]
                if self.use_sigmoid_cls:
                    max_s = jnp.max(s, axis=1)
                else:
                    max_s = jnp.max(s[:, :-1], axis=1)
                max_s = jnp.where(v, max_s, -1.0)
                k = min(nms_pre, ls) if nms_pre > 0 else ls
                _, idx = jax.lax.top_k(max_s, k)
                s = s[idx]
                p = p[idx]
                x = jnp.clip(p[:, 0], 0, img_shape[1])
                y = jnp.clip(p[:, 1], 0, img_shape[0])
                pts_list.append(jnp.stack([x, y], -1))
                sc_list.append(s)
                start += ls
            points = jnp.concatenate(pts_list)
            scores = jnp.concatenate(sc_list)
            if rescale and scale_factor is not None:
                points = points / scale_factor[:2]
            if self.use_sigmoid_cls:
                scores = jnp.concatenate(
                    [scores, jnp.zeros((scores.shape[0], 1))], axis=1)
            wh = jnp.asarray(pseudo_wh, points.dtype)
            pseudo = jnp.concatenate([points - wh / 2, points + wh / 2], -1)
            det = multiclass_nms(pseudo, scores, score_thr, iou_thr,
                                 max_per_img)
            # convert to (cx, cy, score) rows like the reference (:415-419)
            cxy = (det.bboxes[:, :2] + det.bboxes[:, 2:4]) / 2
            pts_out = jnp.concatenate([cxy, det.bboxes[:, 4:5]], -1)
            return det, pts_out

        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        dets, pts = jax.vmap(single)(pred_pts[..., :2], scores_all,
                                     jnp.broadcast_to(valid[None], (b,) + valid.shape),
                                     img_shapes, sf)
        return dets, pts
