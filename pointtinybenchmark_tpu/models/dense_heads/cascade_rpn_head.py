"""Cascade RPN (arXiv 1909.06720).

Parity targets:
- mmdet models/dense_heads/cascade_rpn_head.py (CascadeRPNHead /
  StageCascadeRPNHead): stage 1 is class-free anchor refinement supervised
  by the RegionAssigner; stage 2 re-aligns features to the refined anchors
  (DCN offsets in the reference) and scores+refines them; proposals decode
  from the refined anchors.
- mmdet core/bbox/assigners/region_assigner.py (RegionAssigner): a gt is
  assigned to the pyramid level matching its scale; anchors whose centers
  fall in the gt's center region (center_ratio) on that level are positive,
  an ignore ring (ignore_ratio) on that and adjacent levels is excluded
  from the negatives.

TPU design: both stages run dense over static per-level anchor grids
(one anchor per cell). Stage-2 feature alignment resamples the bridged
feature at the refined-anchor centers (`point_sample_pixel`) and convs —
the gather-based stand-in for DCN used throughout this framework. Region
assignment is fully vectorized over (levels x cells x gt) with masked
min-distance tie-breaks instead of the reference's per-gt python loop.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.anchors import AnchorGenerator
from ...core.bbox import delta2bbox
from ...ops.grid_sample import point_sample_pixel
from ...ops.iou import bbox_overlaps, bbox_overlaps_aligned
from ...ops.nms import nms
from ...utils.registry import HEADS
from ...ops.gather import take_rows

__all__ = ["CascadeRPNHead", "region_assign"]


def region_assign(centers: jnp.ndarray, level_ids: np.ndarray,
                  strides: Sequence[int], gt_bboxes: jnp.ndarray,
                  gt_valid: jnp.ndarray, anchor_scale: float = 4.0,
                  center_ratio: float = 0.2, ignore_ratio: float = 0.5):
    """Vectorized RegionAssigner for one image.

    centers (A, 2) flat cell centers; level_ids (A,) static level index per
    cell; strides per level. Returns (assigned_gt (A,) int32 [-1 ignore /
    0 neg / i+1 pos], pos_mask, valid_neg_mask)."""
    num_lvls = len(strides)
    g = gt_bboxes.shape[0]
    w = gt_bboxes[:, 2] - gt_bboxes[:, 0]
    h = gt_bboxes[:, 3] - gt_bboxes[:, 1]
    scale = jnp.sqrt(jnp.maximum(w * h, 1e-6))
    # target level per gt (region_assigner map_roi_levels analog)
    tgt_lvl = jnp.clip(jnp.floor(
        jnp.log2(scale / anchor_scale / float(strides[0]) + 1e-6)),
        0, num_lvls - 1).astype(jnp.int32)
    cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
    cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5

    stride_arr = jnp.asarray(np.asarray(strides, np.float32)[level_ids])

    def region_mask(ratio):
        # (A, G): cell center inside the ratio-scaled central box of gt.
        # The half-extent is floored at half the cell stride so the region
        # always covers >= 1 cell (the reference converts regions to
        # inclusive cell-index ranges — calc_region semantics).
        half_w = jnp.maximum(w[None, :] * ratio * 0.5,
                             stride_arr[:, None] * 0.5)
        half_h = jnp.maximum(h[None, :] * ratio * 0.5,
                             stride_arr[:, None] * 0.5)
        dx = jnp.abs(centers[:, None, 0] - cx[None, :])
        dy = jnp.abs(centers[:, None, 1] - cy[None, :])
        return (dx <= half_w) & (dy <= half_h)

    lvl_ids = jnp.asarray(level_ids)
    same_lvl = lvl_ids[:, None] == tgt_lvl[None, :]
    adj_lvl = jnp.abs(lvl_ids[:, None] - tgt_lvl[None, :]) <= 1
    gv = gt_valid[None, :]
    pos_cand = region_mask(center_ratio) & same_lvl & gv      # (A, G)
    ign_cand = region_mask(ignore_ratio) & adj_lvl & gv
    # resolve multi-gt: nearest center wins
    d2 = ((centers[:, None, 0] - cx[None, :]) ** 2
          + (centers[:, None, 1] - cy[None, :]) ** 2)
    d2 = jnp.where(pos_cand, d2, jnp.inf)
    best = jnp.argmin(d2, axis=1)
    has_pos = jnp.any(pos_cand, axis=1)
    assigned = jnp.where(has_pos, best + 1, 0)
    ignored = jnp.any(ign_cand, axis=1) & ~has_pos
    assigned = jnp.where(ignored, -1, assigned)
    return assigned.astype(jnp.int32), has_pos, ~ignored & ~has_pos


@HEADS.register_module()
class CascadeRPNHead(nn.Module):
    num_classes: int = 1
    in_channels: int = 256
    feat_channels: int = 256
    strides: Sequence[int] = (4, 8, 16, 32, 64)
    anchor_scale: float = 4.0
    bridged_feature: bool = True
    train_cfg: Optional[Any] = None     # list of 2 stage cfgs or dict
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def _anchors(self, featmap_sizes):
        gen = AnchorGenerator(scales=[self.anchor_scale], ratios=[1.0],
                              strides=list(self.strides))
        return [np.asarray(a, np.float32)
                for a in gen.grid_anchors(featmap_sizes)]

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        # ---- stage 1: dilated-conv adaption, reg only
        adapt1 = nn.Conv(self.feat_channels, (3, 3), padding=3,
                         kernel_dilation=(3, 3), dtype=self.dtype,
                         name="s1_adapt")
        reg1 = nn.Conv(4, (1, 1), dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name="s1_reg")
        # ---- stage 2: offset re-alignment, cls + reg
        adapt2 = nn.Conv(self.feat_channels, (3, 3), padding=1,
                         dtype=self.dtype, name="s2_adapt")
        cls2 = nn.Conv(1, (1, 1), dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       bias_init=nn.initializers.constant(-4.59),
                       name="s2_cls")
        reg2 = nn.Conv(4, (1, 1), dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name="s2_reg")

        reg1_outs, cls2_outs, reg2_outs = [], [], []
        for lvl, f in enumerate(feats):
            x1 = nn.relu(adapt1(f))
            r1 = reg1(x1)
            reg1_outs.append(r1)
            bridged = x1 if self.bridged_feature else f
            b, hh, ww, c = bridged.shape
            # re-align: sample the bridged feature at the refined-anchor
            # center (cell center + predicted xy shift in cells)
            shift = jax.lax.stop_gradient(r1[..., :2])  # dx, dy (stride un.)
            gy, gx = jnp.meshgrid(jnp.arange(hh, dtype=jnp.float32),
                                  jnp.arange(ww, dtype=jnp.float32),
                                  indexing="ij")
            px = gx[None] + shift[..., 0]
            py = gy[None] + shift[..., 1]
            pts = jnp.stack([px, py], -1).reshape(b, hh * ww, 2)
            realigned = point_sample_pixel(bridged, pts).reshape(
                b, hh, ww, c)
            x2 = nn.relu(adapt2(realigned))
            cls2_outs.append(cls2(x2))
            reg2_outs.append(reg2(x2))
        return reg1_outs, cls2_outs, reg2_outs

    # ------------------------------------------------------------- helpers
    def _flat(self, outs, ch):
        b = outs[0].shape[0]
        return jnp.concatenate([o.reshape(b, -1, ch) for o in outs], 1)

    def _stage_cfg(self, i: int) -> dict:
        if isinstance(self.train_cfg, (list, tuple)):
            return dict(self.train_cfg[i])
        return dict(self.train_cfg or {})

    # ---------------------------------------------------------------- loss
    def loss(self, reg1_outs, cls2_outs, reg2_outs, batch: Dict[str, Any],
             rng=None):
        featmap_sizes = [o.shape[1:3] for o in reg1_outs]
        anchors_np = self._anchors(featmap_sizes)
        anchors = jnp.asarray(np.concatenate(anchors_np, 0))   # (A, 4)
        level_ids = np.concatenate([
            np.full(len(a), i, np.int32) for i, a in enumerate(anchors_np)])
        centers = (anchors[:, :2] + anchors[:, 2:]) * 0.5
        a = anchors.shape[0]

        reg1 = self._flat(reg1_outs, 4)
        cls2 = self._flat(cls2_outs, 1)[..., 0]
        reg2 = self._flat(reg2_outs, 4)
        gt_bboxes, gt_valid = batch["gt_bboxes"], batch["gt_valid"]
        cfg1 = self._stage_cfg(0)
        cfg2 = self._stage_cfg(1)
        means = (0., 0., 0., 0.)
        stds1 = tuple(cfg1.get("target_stds", (0.1, 0.1, 0.5, 0.5)))
        stds2 = tuple(cfg2.get("target_stds", (0.05, 0.05, 0.1, 0.1)))
        pos_thr = float(cfg2.get("assigner", {}).get("pos_iou_thr", 0.7))
        neg_thr = float(cfg2.get("assigner", {}).get("neg_iou_thr", 0.3))

        def single(r1, c2, r2, gtb, gv):
            # stage 1: region assignment on the static anchors
            assigned, pos, validneg = region_assign(
                centers, level_ids, self.strides, gtb, gv,
                self.anchor_scale,
                float(cfg1.get("assigner", {}).get("center_ratio", 0.2)),
                float(cfg1.get("assigner", {}).get("ignore_ratio", 0.5)))
            safe = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
            refined = delta2bbox(anchors, r1, means, stds1)
            iou1 = bbox_overlaps_aligned(refined, take_rows(gtb, safe))
            posf = pos.astype(jnp.float32)
            n1 = jnp.maximum(posf.sum(), 1.0)
            loss_reg1 = ((1.0 - iou1) * posf).sum() / n1
            # stage 2: MaxIoU on refined anchors
            refined_sg = jax.lax.stop_gradient(refined)
            ov = bbox_overlaps(refined_sg, gtb)               # (A, G)
            ov = jnp.where(gv[None, :], ov, 0.0)
            max_ov = ov.max(1)
            arg = ov.argmax(1)
            pos2 = max_ov >= pos_thr
            neg2 = max_ov < neg_thr
            safe2 = jnp.clip(arg, 0, gtb.shape[0] - 1)
            final = delta2bbox(refined_sg, r2, means, stds2)
            iou2 = bbox_overlaps_aligned(final, gtb[safe2])
            pos2f = pos2.astype(jnp.float32)
            n2 = jnp.maximum(pos2f.sum(), 1.0)
            loss_reg2 = ((1.0 - iou2) * pos2f).sum() / n2
            # cls BCE: pos=1, neg=0, rest ignored
            tgt = pos2f
            wgt = (pos2 | neg2).astype(jnp.float32)
            bce = (jnp.maximum(c2, 0) - c2 * tgt
                   + jnp.log1p(jnp.exp(-jnp.abs(c2))))
            loss_cls = (bce * wgt).sum() / jnp.maximum(wgt.sum(), 1.0)
            return loss_reg1, loss_cls, loss_reg2, posf.sum(), pos2f.sum()

        l1, lc, l2, n1, n2 = jax.vmap(single)(reg1, cls2, reg2,
                                              gt_bboxes, gt_valid)
        w1 = float(cfg1.get("loss_weight", 10.0))
        w2 = float(cfg2.get("loss_weight", 10.0))
        return {"loss_s1_reg": w1 * l1.mean(),
                "loss_cls": lc.mean(),
                "loss_s2_reg": w2 * l2.mean(),
                "num_pos": n1.sum(), "num_pos2": n2.sum()}

    # ------------------------------------------------------------ proposals
    def get_proposals(self, reg1_outs, cls2_outs, reg2_outs, img_shapes,
                      pad_shape, proposal_cfg: dict
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        nms_pre = int(proposal_cfg.get("nms_pre", 1000))
        max_per_img = int(proposal_cfg.get("max_per_img", 1000))
        iou_thr = float(proposal_cfg.get("nms", {}).get(
            "iou_threshold", 0.7))
        featmap_sizes = [o.shape[1:3] for o in reg1_outs]
        anchors_np = self._anchors(featmap_sizes)
        anchors = jnp.asarray(np.concatenate(anchors_np, 0))
        cfg1 = self._stage_cfg(0)
        cfg2 = self._stage_cfg(1)
        means = (0., 0., 0., 0.)
        stds1 = tuple(cfg1.get("target_stds", (0.1, 0.1, 0.5, 0.5)))
        stds2 = tuple(cfg2.get("target_stds", (0.05, 0.05, 0.1, 0.1)))
        reg1 = self._flat(reg1_outs, 4)
        cls2 = self._flat(cls2_outs, 1)[..., 0]
        reg2 = self._flat(reg2_outs, 4)

        def single(r1, c2, r2, img_shape):
            refined = delta2bbox(anchors, r1, means, stds1)
            final = delta2bbox(refined, r2, means, stds2)
            sc = jax.nn.sigmoid(c2)
            k = min(nms_pre, sc.shape[0])
            top_sc, idx = jax.lax.top_k(sc, k)
            boxes = final[idx]
            boxes = jnp.stack([
                jnp.clip(boxes[:, 0], 0, img_shape[1]),
                jnp.clip(boxes[:, 1], 0, img_shape[0]),
                jnp.clip(boxes[:, 2], 0, img_shape[1]),
                jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
            keep_idx, _ = nms(boxes, top_sc, iou_thr, max_per_img)
            valid = keep_idx >= 0
            safe = jnp.where(valid, keep_idx, 0)
            return (take_rows(boxes, safe),
                    jnp.where(valid, take_rows(top_sc, safe), 0.0), valid)

        return jax.vmap(single)(reg1, cls2, reg2, img_shapes)
