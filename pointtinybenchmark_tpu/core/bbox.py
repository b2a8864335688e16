"""Box transforms and coders.

Parity targets:
- delta2bbox/bbox2delta: mmdet core/bbox/coder/delta_xywh_bbox_coder.py
- distance2bbox/bbox2distance: mmdet core/bbox/transforms.py (FCOS)
- tile-aware bbox_mapping/bbox_mapping_back: fork-modified
  TOV_mmdetection/mmdet/core/bbox/transforms.py:39-80 (subtract tile offset,
  clip to tile, drop <2px boxes; inverse adds the offset back).

All functions are jnp, jit-safe, static-shape; "dropping" boxes is expressed
as a returned validity mask rather than a dynamic filter.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

__all__ = [
    "bbox2delta", "delta2bbox", "distance2bbox", "bbox2distance",
    "xyxy2cxcywh", "cxcywh2xyxy", "bbox_flip", "bbox_mapping_tile",
    "bbox_mapping_back_tile", "bbox_rescale", "bbox_clip", "bbox2roi",
    "bbox2tblr", "tblr2bbox",
]


def bbox2delta(proposals: jnp.ndarray, gt: jnp.ndarray,
               means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.)) -> jnp.ndarray:
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]
    pw = jnp.maximum(pw, 1e-6)
    ph = jnp.maximum(ph, 1e-6)
    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(jnp.maximum(gw, 1e-6) / pw)
    dh = jnp.log(jnp.maximum(gh, 1e-6) / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def delta2bbox(rois: jnp.ndarray, deltas: jnp.ndarray,
               means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.),
               max_shape: Optional[Tuple[int, int]] = None,
               wh_ratio_clip: float = 16 / 1000) -> jnp.ndarray:
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    d = deltas * stds + means
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    max_ratio = jnp.abs(jnp.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1])
        y1 = jnp.clip(y1, 0, max_shape[0])
        x2 = jnp.clip(x2, 0, max_shape[1])
        y2 = jnp.clip(y2, 0, max_shape[0])
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def distance2bbox(points: jnp.ndarray, distance: jnp.ndarray,
                  max_shape: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """points (..., 2) + (l, t, r, b) distances -> xyxy."""
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1])
        y1 = jnp.clip(y1, 0, max_shape[0])
        x2 = jnp.clip(x2, 0, max_shape[1])
        y2 = jnp.clip(y2, 0, max_shape[0])
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox2distance(points: jnp.ndarray, bbox: jnp.ndarray,
                  max_dis: Optional[float] = None, eps: float = 0.1) -> jnp.ndarray:
    left = points[..., 0] - bbox[..., 0]
    top = points[..., 1] - bbox[..., 1]
    right = bbox[..., 2] - points[..., 0]
    bottom = bbox[..., 3] - points[..., 1]
    d = jnp.stack([left, top, right, bottom], axis=-1)
    if max_dis is not None:
        d = jnp.clip(d, 0, max_dis - eps)
    return d


def xyxy2cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    cx = (b[..., 0] + b[..., 2]) * 0.5
    cy = (b[..., 1] + b[..., 3]) * 0.5
    w = b[..., 2] - b[..., 0]
    h = b[..., 3] - b[..., 1]
    return jnp.stack([cx, cy, w, h], axis=-1)


def cxcywh2xyxy(b: jnp.ndarray) -> jnp.ndarray:
    x1 = b[..., 0] - b[..., 2] * 0.5
    y1 = b[..., 1] - b[..., 3] * 0.5
    x2 = b[..., 0] + b[..., 2] * 0.5
    y2 = b[..., 1] + b[..., 3] * 0.5
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox_flip(bboxes: jnp.ndarray, img_shape: Tuple[int, int],
              direction: str = "horizontal") -> jnp.ndarray:
    h, w = img_shape[0], img_shape[1]
    if direction == "horizontal":
        return jnp.stack([w - bboxes[..., 2], bboxes[..., 1],
                          w - bboxes[..., 0], bboxes[..., 3]], axis=-1)
    elif direction == "vertical":
        return jnp.stack([bboxes[..., 0], h - bboxes[..., 3],
                          bboxes[..., 2], h - bboxes[..., 1]], axis=-1)
    raise ValueError(direction)


def bbox_clip(bboxes: jnp.ndarray, img_shape: Tuple[int, int]) -> jnp.ndarray:
    h, w = img_shape[0], img_shape[1]
    return jnp.stack([
        jnp.clip(bboxes[..., 0], 0, w), jnp.clip(bboxes[..., 1], 0, h),
        jnp.clip(bboxes[..., 2], 0, w), jnp.clip(bboxes[..., 3], 0, h)
    ], axis=-1)


def bbox_rescale(bboxes: jnp.ndarray, scale_factor) -> jnp.ndarray:
    """Divide by scale_factor (wx, hy, wx, hy) — network scale -> original."""
    sf = jnp.asarray(scale_factor, bboxes.dtype)
    return bboxes / sf


def bbox_mapping_tile(bboxes: jnp.ndarray, tile_offset: jnp.ndarray,
                      tile_shape: Tuple[int, int],
                      min_size: float = 2.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map full-image boxes into a tile's local frame.

    Parity: fork bbox_mapping (core/bbox/transforms.py:45-58): subtract
    (dx, dy), clip to tile, mark boxes smaller than `min_size` px invalid.

    Returns (mapped_boxes, valid_mask).
    """
    off = jnp.concatenate([tile_offset, tile_offset])  # (4,)
    shifted = bboxes - off
    clipped = bbox_clip(shifted, tile_shape)
    w = clipped[..., 2] - clipped[..., 0]
    h = clipped[..., 3] - clipped[..., 1]
    valid = (w >= min_size) & (h >= min_size)
    return clipped, valid


def bbox_mapping_back_tile(bboxes: jnp.ndarray, tile_offset: jnp.ndarray) -> jnp.ndarray:
    """Inverse of bbox_mapping_tile (fork transforms.py:73-80): add offset."""
    off = jnp.concatenate([tile_offset, tile_offset])
    return bboxes + off


def bbox2roi(bbox_list: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Concatenate per-image (N_i, 4) boxes into (sum N_i, 5) rois with
    leading batch index (mmdet core/bbox/transforms.py bbox2roi parity)."""
    rois = []
    for i, b in enumerate(bbox_list):
        idx = jnp.full((b.shape[0], 1), float(i), b.dtype)
        rois.append(jnp.concatenate([idx, b[:, :4]], axis=1))
    return jnp.concatenate(rois, axis=0)


def bbox2tblr(priors: jnp.ndarray, gts: jnp.ndarray,
              normalizer: float = 4.0,
              normalize_by_wh: bool = True) -> jnp.ndarray:
    """TBLR encode (mmdet core/bbox/coder/tblr_bbox_coder.py:52-100):
    distances from the prior center to the gt's four sides, optionally
    normalized by the prior's h (t, b) and w (l, r)."""
    px = (priors[..., 0] + priors[..., 2]) * 0.5
    py = (priors[..., 1] + priors[..., 3]) * 0.5
    t = py - gts[..., 1]
    b = gts[..., 3] - py
    l = px - gts[..., 0]
    r = gts[..., 2] - px
    out = jnp.stack([t, b, l, r], -1) / normalizer
    if normalize_by_wh:
        w = jnp.clip(priors[..., 2] - priors[..., 0], 1e-6, None)
        h = jnp.clip(priors[..., 3] - priors[..., 1], 1e-6, None)
        out = out / jnp.stack([h, h, w, w], -1)
    return out


def tblr2bbox(priors: jnp.ndarray, tblr: jnp.ndarray,
              normalizer: float = 4.0, normalize_by_wh: bool = True,
              max_shape=None) -> jnp.ndarray:
    """TBLR decode (mmdet tblr_bbox_coder.py:103-160)."""
    loc = tblr * normalizer
    if normalize_by_wh:
        w = jnp.clip(priors[..., 2] - priors[..., 0], 1e-6, None)
        h = jnp.clip(priors[..., 3] - priors[..., 1], 1e-6, None)
        loc = loc * jnp.stack([h, h, w, w], -1)
    px = (priors[..., 0] + priors[..., 2]) * 0.5
    py = (priors[..., 1] + priors[..., 3]) * 0.5
    boxes = jnp.stack([px - loc[..., 2], py - loc[..., 0],
                       px + loc[..., 3], py + loc[..., 1]], -1)
    if max_shape is not None:
        boxes = bbox_clip(boxes, max_shape)
    return boxes
