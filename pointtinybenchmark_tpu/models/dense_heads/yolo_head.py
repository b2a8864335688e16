"""YOLOv3 neck + head.

Parity targets: mmdet models/necks/yolo_neck.py (DetectionBlocks + top-down
concat) and models/dense_heads/yolo_head.py — 3 anchors/level, sigmoid xy
offsets within the cell, exp wh against anchor priors; best-anchor target
assignment (YOLO-style), objectness/class BCE, xy BCE, wh MSE.

TPU design: targets are scattered into the flat (N,) anchor grid with
masked `.at[].set` per padded gt — one vectorized pass, no host loops.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.post_processing import DetResult, multiclass_nms
from ...utils.registry import HEADS, NECKS
from ..backbones.darknet import ConvBNLeaky

__all__ = ["YOLOV3Neck", "YOLOV3Head"]

DEFAULT_ANCHORS = (((116, 90), (156, 198), (373, 326)),   # stride 32
                   ((30, 61), (62, 45), (59, 119)),       # stride 16
                   ((10, 13), (16, 30), (33, 23)))        # stride 8


class DetectionBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32
    use_ra: bool = True

    @nn.compact
    def __call__(self, x):
        x = ConvBNLeaky(self.out_ch, 1, dtype=self.dtype,
                        use_ra=self.use_ra)(x)
        x = ConvBNLeaky(self.out_ch * 2, 3, dtype=self.dtype,
                        use_ra=self.use_ra)(x)
        x = ConvBNLeaky(self.out_ch, 1, dtype=self.dtype,
                        use_ra=self.use_ra)(x)
        x = ConvBNLeaky(self.out_ch * 2, 3, dtype=self.dtype,
                        use_ra=self.use_ra)(x)
        return ConvBNLeaky(self.out_ch, 1, dtype=self.dtype,
                           use_ra=self.use_ra)(x)


@NECKS.register_module()
class YOLOV3Neck(nn.Module):
    in_channels: Sequence[int] = (1024, 512, 256)  # coarse -> fine
    out_channels: Sequence[int] = (512, 256, 128)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats fine->coarse (backbone order); returns coarse->fine."""
        use_ra = not train
        feats = list(feats)[::-1]  # coarse first
        outs = []
        x = DetectionBlock(self.out_channels[0], dtype=self.dtype,
                           use_ra=use_ra, name="detect0")(feats[0])
        outs.append(x)
        for i in range(1, len(feats)):
            y = ConvBNLeaky(self.out_channels[i], 1, dtype=self.dtype,
                            use_ra=use_ra, name=f"lateral{i}")(x)
            th, tw = feats[i].shape[1:3]
            y = jax.image.resize(y, (y.shape[0], th, tw, y.shape[3]),
                                 method="nearest")
            x = jnp.concatenate([y, feats[i]], -1)
            x = DetectionBlock(self.out_channels[i], dtype=self.dtype,
                               use_ra=use_ra, name=f"detect{i}")(x)
            outs.append(x)
        return tuple(outs)  # coarse -> fine (strides 32, 16, 8)


@HEADS.register_module()
class YOLOV3Head(nn.Module):
    num_classes: int
    in_channels: Sequence[int] = (512, 256, 128)
    out_channels: Sequence[int] = (1024, 512, 256)
    strides: Sequence[int] = (32, 16, 8)
    anchors: Sequence = DEFAULT_ANCHORS
    ignore_iou_thr: float = 0.5
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @property
    def na(self) -> int:
        return len(self.anchors[0])

    @nn.compact
    def __call__(self, feats, train: bool = False):
        outs = []
        for i, f in enumerate(feats):
            y = ConvBNLeaky(self.out_channels[i], 3, dtype=self.dtype,
                            use_ra=not train, name=f"conv_bridge{i}")(f)
            y = nn.Conv(self.na * (5 + self.num_classes), (1, 1),
                        dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01),
                        name=f"conv_pred{i}")(y)
            outs.append(y)
        return (outs,)

    # ------------------------------------------------------------- helpers
    def _grid(self, featmap_sizes):
        """Flat per-location data: cell xy (N, 2), stride (N,), anchor wh
        (N, 2), level sizes."""
        cells, strides_f, awh, sizes = [], [], [], []
        for (h, w), s, lvl_anchors in zip(featmap_sizes, self.strides,
                                          self.anchors):
            xx, yy = np.meshgrid(np.arange(w), np.arange(h))
            cell = np.stack([xx.ravel(), yy.ravel()], -1).astype(np.float32)
            for a in lvl_anchors:
                cells.append(cell)
                strides_f.append(np.full((h * w,), s, np.float32))
                awh.append(np.tile(np.asarray(a, np.float32), (h * w, 1)))
            sizes.append(h * w * self.na)
        return (np.concatenate(cells), np.concatenate(strides_f),
                np.concatenate(awh), sizes)

    def _flatten(self, outs, b):
        flat = []
        for o in outs:
            h, w = o.shape[1:3]
            o = o.reshape(b, h * w, self.na, 5 + self.num_classes)
            flat.append(o.transpose(0, 2, 1, 3).reshape(
                b, self.na * h * w, -1))
        return jnp.concatenate(flat, 1)

    # reorder note: _grid stacks per-anchor blocks [a0 cells..., a1 cells...]
    # and _flatten matches via the transpose above.

    def decode(self, pred: jnp.ndarray, cells: np.ndarray,
               strides: np.ndarray, awh: np.ndarray) -> jnp.ndarray:
        xy = (jax.nn.sigmoid(pred[..., :2]) + cells) * strides[:, None]
        wh = jnp.exp(jnp.clip(pred[..., 2:4], -10, 8)) * awh
        return jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)

    # ---------------------------------------------------------------- loss
    def loss(self, outs, batch: Dict[str, Any], rng=None):
        b = outs[0].shape[0]
        featmap_sizes = [o.shape[1:3] for o in outs]
        cells, strides, awh, level_sizes = self._grid(featmap_sizes)
        pred = self._flatten(outs, b)                     # (B, N, 5+C)
        n = pred.shape[1]

        gt_bboxes = batch["gt_bboxes"]
        gt_labels = batch["gt_labels"]
        gt_valid = batch["gt_valid"]
        g = gt_bboxes.shape[1]

        # best anchor (over all 9 priors) by shape IoU
        gwh = jnp.clip(gt_bboxes[..., 2:] - gt_bboxes[..., :2], 1e-3, None)
        priors = np.asarray([a for lvl in self.anchors for a in lvl],
                            np.float32)                   # (9, 2)
        inter = (jnp.minimum(gwh[..., None, 0], priors[None, None, :, 0])
                 * jnp.minimum(gwh[..., None, 1], priors[None, None, :, 1]))
        union = (gwh[..., 0:1] * gwh[..., 1:2]
                 + priors[:, 0] * priors[:, 1] - inter)
        shape_iou = inter / jnp.maximum(union, 1e-6)      # (B, G, 9)
        best_a = jnp.argmax(shape_iou, -1)                # (B, G) in [0, 9)

        lvl_of = best_a // self.na                         # level index
        a_of = best_a % self.na
        gxy = (gt_bboxes[..., :2] + gt_bboxes[..., 2:]) / 2
        lvl_strides = np.asarray(self.strides, np.float32)
        s_of = jnp.asarray(lvl_strides)[lvl_of]
        cx = jnp.clip((gxy[..., 0] // s_of).astype(jnp.int32), 0, 10 ** 6)
        cy = jnp.clip((gxy[..., 1] // s_of).astype(jnp.int32), 0, 10 ** 6)
        # flat index: level offset + anchor block + cell
        level_offsets = np.cumsum([0] + level_sizes[:-1])
        widths = np.asarray([fs[1] for fs in featmap_sizes])
        heights = np.asarray([fs[0] for fs in featmap_sizes])
        w_of = jnp.asarray(widths)[lvl_of]
        h_of = jnp.asarray(heights)[lvl_of]
        cx = jnp.minimum(cx, w_of - 1)
        cy = jnp.minimum(cy, h_of - 1)
        hw_of = w_of * h_of
        flat = (jnp.asarray(level_offsets)[lvl_of] + a_of * hw_of
                + cy * w_of + cx)                          # (B, G)
        flat = jnp.where(gt_valid, flat, 0)

        # scatter targets
        def per_image(flat_i, gv, gtb, gtl, s_i, cx_i, cy_i):
            obj_t = jnp.zeros((n,), jnp.float32)
            obj_t = obj_t.at[flat_i].max(gv.astype(jnp.float32))
            pos_mask = jnp.zeros((n,), bool).at[flat_i].max(gv)
            cls_t = jnp.zeros((n,), jnp.int32).at[flat_i].set(
                jnp.where(gv, gtl, 0))
            gxy_i = (gtb[:, :2] + gtb[:, 2:]) / 2
            txy = gxy_i / s_i[:, None] - jnp.stack(
                [cx_i, cy_i], -1).astype(jnp.float32)      # in (0,1)
            gwh_i = jnp.clip(gtb[:, 2:] - gtb[:, :2], 1e-3, None)
            xy_t = jnp.zeros((n, 2)).at[flat_i].set(
                jnp.where(gv[:, None], jnp.clip(txy, 1e-4, 1 - 1e-4), 0.5))
            wh_box = jnp.zeros((n, 2)).at[flat_i].set(
                jnp.where(gv[:, None], gwh_i, 1.0))
            return obj_t, pos_mask, cls_t, xy_t, wh_box

        obj_t, pos_mask, cls_t, xy_t, wh_box = jax.vmap(per_image)(
            flat, gt_valid, gt_bboxes, gt_labels, s_of, cx, cy)

        # ignore region: predictions overlapping any gt above thr are not neg
        decoded = self.decode(pred[..., :4], cells, strides, awh)
        from ...ops.iou import bbox_overlaps
        gt_masked = jnp.where(gt_valid[..., None], gt_bboxes, -1e4)
        ious = jax.vmap(bbox_overlaps)(decoded, gt_masked)   # (B, N, G)
        max_iou = jnp.max(ious, -1)
        neg_mask = (~pos_mask) & (max_iou < self.ignore_iou_thr)

        obj_pred = pred[..., 4]
        cls_pred = pred[..., 5:]
        xy_pred = pred[..., :2]
        wh_pred = pred[..., 2:4]

        def bce(logit, t):
            return (jnp.maximum(logit, 0) - logit * t
                    + jnp.log1p(jnp.exp(-jnp.abs(logit))))

        num_pos = jnp.maximum(pos_mask.sum().astype(jnp.float32), 1.0)
        w_obj = (pos_mask | neg_mask).astype(jnp.float32)
        loss_conf = (bce(obj_pred, obj_t) * w_obj).sum() / num_pos
        onehot = jax.nn.one_hot(cls_t, self.num_classes)
        pos_f = pos_mask.astype(jnp.float32)
        loss_cls = (bce(cls_pred, onehot).sum(-1) * pos_f).sum() / num_pos
        loss_xy = (bce(xy_pred, xy_t).sum(-1) * pos_f).sum() / num_pos
        awh_b = jnp.asarray(awh)[None]
        wh_t = jnp.log(jnp.clip(wh_box / awh_b, 1e-4, None))
        loss_wh = (((wh_pred - wh_t) ** 2).sum(-1) * pos_f).sum() / num_pos
        return {"loss_conf": loss_conf, "loss_cls": loss_cls,
                "loss_xy": loss_xy, "loss_wh": loss_wh, "num_pos": num_pos}

    # ------------------------------------------------------------ inference
    def get_bboxes(self, outs, img_shapes, pad_shape, scale_factors=None,
                   rescale: bool = False) -> DetResult:
        cfg = self.test_cfg or {}
        nms_pre = int(cfg.get("nms_pre", 1000))
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg.get("nms", {}).get("iou_threshold", 0.45))
        max_per_img = int(cfg.get("max_per_img", 100))
        b = outs[0].shape[0]
        featmap_sizes = [o.shape[1:3] for o in outs]
        cells, strides, awh, _ = self._grid(featmap_sizes)
        conf_thr = float(cfg.get("conf_thr", -1))
        pred = self._flatten(outs, b)
        boxes = self.decode(pred[..., :4], cells, strides, awh)
        conf = jax.nn.sigmoid(pred[..., 4])
        cls = jax.nn.sigmoid(pred[..., 5:])

        def single(bx, sc, cf, img_shape, scale_factor):
            # reference yolo_head.py:383-402: conf_thr gates candidates
            # (>= conf_thr), score_thr gates raw cls scores, objectness
            # multiplies after as score_factors.
            max_s = jnp.max(sc, -1) * cf
            k = min(nms_pre, sc.shape[0]) if nms_pre > 0 else sc.shape[0]
            _, idx = jax.lax.top_k(max_s, k)
            bx = bx[idx]
            sc = sc[idx]
            cf = cf[idx]
            bx = jnp.stack([
                jnp.clip(bx[:, 0], 0, img_shape[1]),
                jnp.clip(bx[:, 1], 0, img_shape[0]),
                jnp.clip(bx[:, 2], 0, img_shape[1]),
                jnp.clip(bx[:, 3], 0, img_shape[0])], -1)
            if rescale and scale_factor is not None:
                bx = bx / scale_factor
            valid = (cf >= conf_thr) if conf_thr > 0 else None
            sc = jnp.concatenate([sc, jnp.zeros((sc.shape[0], 1))], -1)
            return multiclass_nms(bx, sc, score_thr, iou_thr, max_per_img,
                                  valid_mask=valid, score_factors=cf)

        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        dets = jax.vmap(single)(boxes, cls, conf, img_shapes, sf)
        return dets, None
