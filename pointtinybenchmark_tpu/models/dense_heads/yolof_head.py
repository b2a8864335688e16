"""YOLOF — single-level detection (You Only Look One-level Feature).

Parity targets: mmdet models/necks/dilated_encoder.py (residual dilated
blocks over C5) and models/dense_heads/yolof_head.py (cls/reg subnets +
objectness, normalized classification score, UniformAssigner with
match_times top-k matching on both predicted-box and anchor distances,
ctr-clamped delta decoding).

TPU design: one stride-32 level keeps everything a single static (A,)
anchor set; uniform matching is two batched top-k's over an (A, G)
distance matrix scattered into a positive mask — no per-gt host loop.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.post_processing import DetResult, multiclass_nms
from ...ops.iou import bbox_overlaps
from ...utils.registry import HEADS, LOSSES, NECKS
from ...ops.gather import take_rows
from ..utils import bias_init_with_prob

__all__ = ["DilatedEncoder", "YOLOFHead"]


@NECKS.register_module()
class DilatedEncoder(nn.Module):
    in_channels: int = 2048
    out_channels: int = 512
    block_mid_channels: int = 128
    num_residual_blocks: int = 4
    block_dilations: Sequence[int] = (2, 4, 6, 8)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[-1]
        ra = True  # encoder BN frozen-stats like the reference's eval-mode BN

        def cbr(y, ch, k, dilation=1, relu=True, name=None):
            y = nn.Conv(ch, (k, k), padding=k // 2 * dilation,
                        kernel_dilation=(dilation, dilation),
                        dtype=self.dtype, name=f"{name}_conv")(y)
            y = nn.BatchNorm(use_running_average=ra, dtype=self.dtype,
                             name=f"{name}_bn")(y)
            return nn.relu(y) if relu else y

        x = cbr(x, self.out_channels, 1, relu=False, name="lateral")
        x = cbr(x, self.out_channels, 3, relu=False, name="fpn")
        for i in range(self.num_residual_blocks):
            d = self.block_dilations[i]
            y = cbr(x, self.block_mid_channels, 1, name=f"blk{i}_reduce")
            y = cbr(y, self.block_mid_channels, 3, dilation=d,
                    name=f"blk{i}_dilated")
            y = cbr(y, self.out_channels, 1, name=f"blk{i}_expand")
            x = x + y
        return (x,)


@HEADS.register_module()
class YOLOFHead(nn.Module):
    num_classes: int
    in_channels: int = 512
    num_cls_convs: int = 2
    num_reg_convs: int = 4
    stride: int = 32
    anchor_scales: Sequence[int] = (1, 2, 4, 8, 16)
    match_times: int = 4
    pos_ignore_thr: float = 0.15
    neg_ignore_thr: float = 0.7
    ctr_clamp: float = 32.0
    target_stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[0]
        a = len(self.anchor_scales)
        ra = True

        def cbr(y, ch, name):
            y = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                        name=f"{name}_conv")(y)
            y = nn.BatchNorm(use_running_average=ra, dtype=self.dtype,
                             name=f"{name}_bn")(y)
            return nn.relu(y)

        cf, rf = x, x
        for i in range(self.num_cls_convs):
            cf = cbr(cf, self.in_channels, f"cls{i}")
        for i in range(self.num_reg_convs):
            rf = cbr(rf, self.in_channels, f"reg{i}")
        cls_score = nn.Conv(a * self.num_classes, (3, 3), padding=1,
                            bias_init=nn.initializers.constant(
                                bias_init_with_prob(0.01)),
                            dtype=self.dtype, name="cls_score")(cf)
        bbox_pred = nn.Conv(a * 4, (3, 3), padding=1, dtype=self.dtype,
                            name="bbox_pred")(rf)
        objectness = nn.Conv(a, (3, 3), padding=1, dtype=self.dtype,
                             name="objectness")(rf)
        return cls_score, bbox_pred, objectness

    # ------------------------------------------------------------- anchors
    def anchors(self, featmap_size) -> np.ndarray:
        h, w = featmap_size
        s = self.stride
        xs = (np.arange(w) * s + s / 2).astype(np.float32)
        ys = (np.arange(h) * s + s / 2).astype(np.float32)
        xx, yy = np.meshgrid(xs, ys)
        ctr = np.stack([xx.ravel(), yy.ravel()], -1)          # (HW, 2)
        out = []
        for sc in self.anchor_scales:
            half = s * sc / 2
            out.append(np.concatenate([ctr - half, ctr + half], -1))
        # (HW, A, 4) interleaved like the conv output layout
        return np.stack(out, 1).reshape(-1, 4)

    def _decode(self, anchors, deltas):
        """DeltaXYWH decode with YOLOF's ctr_clamp (mmdet delta_xywh
        bbox coder add_ctr_clamp=True, ctr_clamp=32)."""
        stds = jnp.asarray(self.target_stds)
        d = deltas * stds
        aw = anchors[:, 2] - anchors[:, 0]
        ah = anchors[:, 3] - anchors[:, 1]
        ax = (anchors[:, 0] + anchors[:, 2]) / 2
        ay = (anchors[:, 1] + anchors[:, 3]) / 2
        dx = jnp.clip(d[:, 0] * aw, -self.ctr_clamp, self.ctr_clamp)
        dy = jnp.clip(d[:, 1] * ah, -self.ctr_clamp, self.ctr_clamp)
        cx = ax + dx
        cy = ay + dy
        w = aw * jnp.exp(jnp.clip(d[:, 2], None, 4.0))
        h = ah * jnp.exp(jnp.clip(d[:, 3], None, 4.0))
        return jnp.stack([cx - w / 2, cy - h / 2,
                          cx + w / 2, cy + h / 2], -1)

    @staticmethod
    def _normalized_score(cls_score, objectness):
        """log P(cls, obj) fusion (yolof_head.py normalized_cls_score)."""
        return cls_score + objectness - jnp.log(
            1.0 + jnp.exp(jnp.clip(cls_score, None, 20.0))
            + jnp.exp(jnp.clip(objectness, None, 20.0)))

    # ---------------------------------------------------------------- loss
    def loss(self, cls_score, bbox_pred, objectness, batch: Dict[str, Any],
             rng=None) -> Dict[str, jnp.ndarray]:
        b, h, w, _ = cls_score.shape
        a = len(self.anchor_scales)
        anchors = jnp.asarray(self.anchors((h, w)))          # (N, 4)
        n = anchors.shape[0]
        cls = cls_score.reshape(b, n, self.num_classes)
        reg = bbox_pred.reshape(b, n, 4)
        obj = objectness.reshape(b, n, 1)
        norm_cls = self._normalized_score(cls, obj)

        def single(cls_s, reg_s, gt_bboxes, gt_labels, gt_valid):
            pred = self._decode(anchors, reg_s)              # (N, 4)
            g = gt_bboxes.shape[0]

            def center(bx):
                return jnp.stack([(bx[:, 0] + bx[:, 2]) / 2,
                                  (bx[:, 1] + bx[:, 3]) / 2], -1)

            # cost: L1 over box coords (reference uses cdist on xyxy)
            cost_pred = jnp.abs(pred[:, None] - gt_bboxes[None]).sum(-1)
            cost_anc = jnp.abs(anchors[:, None] - gt_bboxes[None]).sum(-1)
            k = min(self.match_times, n)

            def topk_mask(cost):
                _, idx = jax.lax.top_k(-cost.T, k)           # (G, k)
                m = jnp.zeros((g, n), bool)
                m = m.at[jnp.arange(g)[:, None], idx].set(True)
                return m.T                                   # (N, G)

            cand = (topk_mask(cost_pred) | topk_mask(cost_anc)) \
                & gt_valid[None, :]
            iou_pred = bbox_overlaps(pred, gt_bboxes)        # (N, G)
            # positives must overlap their gt enough
            pos_m = cand & (iou_pred >= self.pos_ignore_thr)
            # each anchor takes its best candidate gt
            iou_m = jnp.where(pos_m, iou_pred, -1.0)
            gt_idx = jnp.argmax(iou_m, 1)
            pos = jnp.max(iou_m, 1) > -1.0
            # ignore negatives whose prediction already overlaps some gt
            max_iou = jnp.max(jnp.where(gt_valid[None, :], iou_pred, 0.0), 1)
            ignore = (~pos) & (max_iou > self.neg_ignore_thr)
            # and candidates that failed pos_ignore_thr are ignored too
            failed = jnp.any(cand, 1) & ~pos
            ignore = ignore | failed
            labels = jnp.where(pos, take_rows(gt_labels, gt_idx),
                               self.num_classes)
            return pred, take_rows(gt_bboxes, gt_idx), labels, pos, ignore

        pred, gb, labels, pos, ignore = jax.vmap(single)(
            cls, reg, batch["gt_bboxes"], batch["gt_labels"],
            batch["gt_valid"])
        pos_f = pos.astype(jnp.float32)
        num_pos = jnp.maximum(pos_f.sum(), 1.0)
        valid_w = 1.0 - ignore.astype(jnp.float32)

        loss_cls_fn = LOSSES.build(dict(
            self.loss_cls or dict(type="FocalLoss", use_sigmoid=True,
                                  gamma=2.0, alpha=0.25, loss_weight=1.0)))
        loss_cls = loss_cls_fn(norm_cls.reshape(-1, self.num_classes),
                               labels.reshape(-1),
                               weight=valid_w.reshape(-1),
                               avg_factor=num_pos)
        loss_bbox_fn = LOSSES.build(dict(
            self.loss_bbox or dict(type="GIoULoss", loss_weight=1.0)))
        loss_bbox = loss_bbox_fn(pred.reshape(-1, 4), gb.reshape(-1, 4),
                                 weight=pos_f.reshape(-1),
                                 avg_factor=num_pos)
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "num_pos": pos_f.sum()}

    # ------------------------------------------------------------ inference
    def get_bboxes(self, cls_score, bbox_pred, objectness, img_shapes,
                   pad_shape, scale_factors=None,
                   rescale: bool = False) -> DetResult:
        cfg = self.test_cfg or {}
        nms_pre = int(cfg.get("nms_pre", 1000))
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg.get("nms", {}).get("iou_threshold", 0.6))
        max_per_img = int(cfg.get("max_per_img", 100))
        b, h, w, _ = cls_score.shape
        anchors = jnp.asarray(self.anchors((h, w)))
        n = anchors.shape[0]
        cls = cls_score.reshape(b, n, self.num_classes)
        reg = bbox_pred.reshape(b, n, 4)
        obj = objectness.reshape(b, n, 1)
        scores_all = jax.nn.sigmoid(self._normalized_score(cls, obj))

        def single(sc, reg_s, img_shape, scale_factor):
            rank = jnp.max(sc, -1)
            k = min(nms_pre, n) if nms_pre > 0 else n
            _, idx = jax.lax.top_k(rank, k)
            boxes = self._decode(anchors[idx], reg_s[idx])
            boxes = jnp.stack([
                jnp.clip(boxes[:, 0], 0, img_shape[1]),
                jnp.clip(boxes[:, 1], 0, img_shape[0]),
                jnp.clip(boxes[:, 2], 0, img_shape[1]),
                jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
            if rescale and scale_factor is not None:
                boxes = boxes / scale_factor
            s = jnp.concatenate([sc[idx], jnp.zeros((k, 1))], -1)
            return multiclass_nms(boxes, s, score_thr, iou_thr, max_per_img)

        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        dets = jax.vmap(single)(scores_all, reg, img_shapes, sf)
        return dets, None
