"""Grid R-CNN (arXiv 1811.12030 / plus 1906.05688).

Parity targets:
- mmdet models/roi_heads/grid_roi_head.py (GridRoIHead): bbox branch trains
  as usual; a grid branch on jittered positive RoIs localizes a 3x3 lattice
  of gt-box points via heatmaps; at test, the grid head refines the
  NMS-ed detection boxes.
- mmdet models/roi_heads/mask_heads/grid_head.py (GridHead): conv stack ->
  2x deconv -> per-point 56x56 heatmaps with first-order neighbor fusion;
  cross-shaped (radius) binary targets; box edges recovered as
  confidence-weighted means of the relevant lattice points.

TPU redesign notes:
- The reference supervises each point only inside its quadrant sub-region
  (calc_sub_regions) and uses both first+second-order fusion; here fusion is
  first-order (sum of 5x5-conv neighbor features) and supervision is
  full-map with radius-1 cross targets — same estimator shape, simpler
  static graph (deviation documented).
- RoI jitter (amplitude 0.15, grid_roi_head._random_jitter) is a vectorized
  uniform perturbation under the train-step `sampler` RNG.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import HEADS
from .standard_roi_head import StandardRoIHead

__all__ = ["GridHead", "GridRoIHead"]


# 3x3 lattice, row-major: (ix, iy) in {0, 0.5, 1}
_GRID_XY = jnp.asarray([(ix, iy) for iy in (0.0, 0.5, 1.0)
                        for ix in (0.0, 0.5, 1.0)], jnp.float32)
# neighbor graph on the lattice (4-connectivity) for first-order fusion
_NEIGHBORS = {0: (1, 3), 1: (0, 2, 4), 2: (1, 5), 3: (0, 4, 6),
              4: (1, 3, 5, 7), 5: (2, 4, 8), 6: (3, 7), 7: (4, 6, 8),
              8: (5, 7)}


@HEADS.register_module()
class GridHead(nn.Module):
    grid_points: int = 9
    num_convs: int = 8
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x (N, s, s, C) -> heatmaps (N, 4s, 4s, grid_points)."""
        groups = 36 if self.feat_channels % 36 == 0 else \
            max(g for g in (32, 16, 8, 4, 2, 1) if self.feat_channels % g == 0)
        for i in range(self.num_convs):
            x = nn.relu(nn.GroupNorm(num_groups=groups, epsilon=1e-5)(nn.Conv(
                self.feat_channels, (3, 3), padding=1, dtype=self.dtype,
                name=f"conv{i}")(x)))
        # split into per-point feature groups and fuse neighbors (1st order)
        pf = self.point_feat_channels
        feats = [nn.Conv(pf, (1, 1), dtype=self.dtype,
                         name=f"point_feat{k}")(x)
                 for k in range(self.grid_points)]
        fused = []
        for k in range(self.grid_points):
            f = feats[k]
            for j in _NEIGHBORS[k]:
                f = f + nn.Conv(pf, (5, 5), padding=2, feature_group_count=1,
                                dtype=self.dtype,
                                name=f"fuse{j}_{k}")(feats[j])
            fused.append(f)
        heat = []
        for k in range(self.grid_points):
            y = nn.relu(nn.ConvTranspose(pf, (2, 2), strides=(2, 2),
                                         dtype=self.dtype,
                                         name=f"deconv1_{k}")(fused[k]))
            y = nn.ConvTranspose(1, (2, 2), strides=(2, 2), dtype=self.dtype,
                                 bias_init=nn.initializers.constant(-4.6),
                                 name=f"deconv2_{k}")(y)
            heat.append(y[..., 0])
        return jnp.stack(heat, -1)


def grid_targets(rois: jnp.ndarray, gt_boxes: jnp.ndarray,
                 heat_size: int) -> jnp.ndarray:
    """Cross-shaped binary targets (grid_head.get_targets).

    rois (N, 5), gt_boxes (N, 4) matched gt per roi. Returns
    (N, heat_size, heat_size, 9)."""
    x1, y1 = rois[:, 1], rois[:, 2]
    w = jnp.maximum(rois[:, 3] - x1, 1e-3)
    h = jnp.maximum(rois[:, 4] - y1, 1e-3)
    gx = gt_boxes[:, 0:1] + (gt_boxes[:, 2:3] - gt_boxes[:, 0:1]) \
        * _GRID_XY[None, :, 0]
    gy = gt_boxes[:, 1:2] + (gt_boxes[:, 3:4] - gt_boxes[:, 1:2]) \
        * _GRID_XY[None, :, 1]
    px = (gx - x1[:, None]) / w[:, None] * heat_size
    py = (gy - y1[:, None]) / h[:, None] * heat_size
    ix = jnp.clip(jnp.floor(px), 0, heat_size - 1)
    iy = jnp.clip(jnp.floor(py), 0, heat_size - 1)
    inside = ((px >= 0) & (px < heat_size) & (py >= 0) & (py < heat_size))
    xs = jnp.arange(heat_size, dtype=jnp.float32)
    # cross of radius 1 around (ix, iy)
    dx = jnp.abs(xs[None, :, None] - ix[:, None, :])       # (N, W, 9)
    dy = jnp.abs(xs[None, :, None] - iy[:, None, :])       # (N, H, 9)
    cross = ((dx[:, None, :, :] <= 1) & (dy[:, :, None, :] == 0)) | \
            ((dx[:, None, :, :] == 0) & (dy[:, :, None, :] <= 1))
    return jnp.where(inside[:, None, None, :], cross, False).astype(
        jnp.float32)


@HEADS.register_module()
class GridRoIHead(StandardRoIHead):
    grid_roi_extractor: Optional[dict] = None
    grid_head: Optional[dict] = None

    def setup(self):
        super().setup()
        cfg = dict(self.grid_head or {})
        cfg.pop("type", None)
        self.grid_head_m = GridHead(**cfg)

    def _grid_extract(self, feats, rois):
        cfg = dict(self.grid_roi_extractor or self.bbox_roi_extractor or {})
        from .roi_extractor import single_roi_extract
        roi_layer = dict(cfg.get("roi_layer", {}))
        strides = tuple(cfg.get("featmap_strides", (4, 8, 16, 32)))
        return single_roi_extract(
            feats[:len(strides)], rois, strides,
            int(roi_layer.get("output_size", 14)),
            (int(roi_layer.get("sampling_ratio", 0)) or 2),
            float(cfg.get("finest_scale", 56)))

    # -------------------------------------------------------------- train
    def forward_train(self, feats, proposals, prop_valid, batch, rng):
        rng, jitter_key = jax.random.split(rng)
        out = super().forward_train(feats, proposals, prop_valid, batch, rng)
        rois, pos_w, gt_idx = self._last_sample  # stashed by _bbox_loss hook
        # jitter pos rois (amplitude 0.15 of wh, grid_roi_head._random_jitter)
        boxes = rois[:, 1:5]
        wh = jnp.maximum(boxes[:, 2:4] - boxes[:, 0:2], 1.0)
        noise = jax.random.uniform(jitter_key, (boxes.shape[0], 4),
                                   minval=-0.15, maxval=0.15)
        jit = jnp.concatenate([noise[:, :2] * wh, noise[:, 2:] * wh], -1)
        jboxes = boxes + jit
        jrois = jnp.concatenate([rois[:, :1], jboxes], 1)
        # grid branch budget: cap at 96 rois to bound the deconv cost
        # (reference max_num_grid=192 at 512 rois/img; scaled to budget)
        n = jrois.shape[0]
        k = min(n, 96)
        _, top = jax.lax.top_k(pos_w + jax.random.uniform(
            jax.random.fold_in(jitter_key, 3), (n,)) * 0.01, k)
        sel_rois = jrois[top]
        grid_feats = self._grid_extract(feats, sel_rois)
        heat = self.grid_head_m(grid_feats)
        hs = heat.shape[1]
        b, g = batch["gt_bboxes"].shape[:2]
        s = n // b
        img_idx = jnp.repeat(jnp.arange(b), s)[top]
        matched_gt = batch["gt_bboxes"][img_idx, gt_idx.reshape(-1)[top]]
        tgt = grid_targets(sel_rois, matched_gt, hs)
        bce = (jnp.maximum(heat, 0) - heat * tgt
               + jnp.log1p(jnp.exp(-jnp.abs(heat))))
        w = pos_w[top]
        num_pos = jnp.maximum(w.sum(), 1.0)
        # mean over map+points per roi, weighted by positive-ness
        out["loss_grid"] = 15.0 * (bce.mean((1, 2, 3)) * w).sum() / num_pos
        return out

    def _bbox_loss(self, cls_score, bbox_pred, roi_boxes, roi_labels,
                   roi_deltas, pos_w, samp_w, gt_idx):
        out = super()._bbox_loss(cls_score, bbox_pred, roi_boxes, roi_labels,
                                 roi_deltas, pos_w, samp_w, gt_idx)
        b, s = roi_boxes.shape[:2]
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), s)[:, None]
        rois = jnp.concatenate([bidx, roi_boxes.reshape(b * s, 4)], 1)
        object.__setattr__(self, "_last_sample",
                           (rois, pos_w.reshape(-1), gt_idx))
        return out

    # ------------------------------------------------------------ test
    def simple_test(self, feats, proposals, prop_valid, img_shapes,
                    scale_factors=None, rescale: bool = False):
        dets = super().simple_test(feats, proposals, prop_valid, img_shapes,
                                   scale_factors, rescale)
        det_boxes = dets.bboxes[..., :4]
        if rescale and scale_factors is not None:
            det_boxes = det_boxes * scale_factors[:, None, :]
        b, m = det_boxes.shape[:2]
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), m)[:, None]
        rois = jnp.concatenate([bidx, det_boxes.reshape(b * m, 4)], 1)
        grid_feats = self._grid_extract(feats, rois)
        heat = jax.nn.sigmoid(self.grid_head_m(grid_feats))
        refined = grid_refine_boxes(rois, heat)
        if rescale and scale_factors is not None:
            refined = refined.reshape(b, m, 4) / scale_factors[:, None, :]
        else:
            refined = refined.reshape(b, m, 4)
        new_bboxes = jnp.concatenate([refined, dets.bboxes[..., 4:]], -1)
        return dets._replace(bboxes=new_bboxes)


def grid_refine_boxes(rois: jnp.ndarray, heat: jnp.ndarray) -> jnp.ndarray:
    """grid_head.get_bboxes: per-point argmax position, then box edges =
    confidence-weighted mean of the relevant lattice points' coords."""
    n, hs = heat.shape[0], heat.shape[1]
    flat = heat.reshape(n, hs * hs, 9)
    idx = jnp.argmax(flat, axis=1)                        # (N, 9)
    score = jnp.max(flat, axis=1)                         # (N, 9)
    py = (idx // hs).astype(jnp.float32) + 0.5
    px = (idx % hs).astype(jnp.float32) + 0.5
    x1, y1 = rois[:, 1:2], rois[:, 2:3]
    w = jnp.maximum(rois[:, 3:4] - x1, 1e-3)
    h = jnp.maximum(rois[:, 4:5] - y1, 1e-3)
    ax = x1 + px / hs * w                                  # (N, 9) abs coords
    ay = y1 + py / hs * h
    cols = _GRID_XY[:, 0]
    rows = _GRID_XY[:, 1]

    def edge(vals, scores, mask):
        msum = jnp.maximum((scores * mask).sum(-1), 1e-6)
        return (vals * scores * mask).sum(-1) / msum

    xmin = edge(ax, score, (cols == 0.0)[None, :])
    xmax = edge(ax, score, (cols == 1.0)[None, :])
    ymin = edge(ay, score, (rows == 0.0)[None, :])
    ymax = edge(ay, score, (rows == 1.0)[None, :])
    xmax = jnp.maximum(xmax, xmin)
    ymax = jnp.maximum(ymax, ymin)
    return jnp.stack([xmin, ymin, xmax, ymax], -1)
