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

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "bbox2delta", "delta2bbox", "distance2bbox", "bbox2distance",
    "xyxy2cxcywh", "cxcywh2xyxy", "bbox_flip", "bbox_mapping_tile",
    "bbox_mapping_back_tile", "bbox_rescale", "bbox_clip", "bbox2roi",
    "bbox2tblr", "tblr2bbox", "bbox_rescale_center", "bbox2bucket", "bucket2bbox",
    "legacy_bbox2delta", "legacy_delta2bbox", "delta_coder_fns",
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


def legacy_bbox2delta(proposals: jnp.ndarray, gt: jnp.ndarray,
                      means=(0., 0., 0., 0.),
                      stds=(1., 1., 1., 1.)) -> jnp.ndarray:
    """MMDet V1.x delta encode (mmdet core/bbox/coder/
    legacy_delta_xywh_bbox_coder.py::legacy_bbox2delta): identical to
    bbox2delta except width/height carry the V1.x +1 pixel convention."""
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0] + 1.0
    ph = proposals[..., 3] - proposals[..., 1] + 1.0
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0] + 1.0
    gh = gt[..., 3] - gt[..., 1] + 1.0
    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(gw / pw)
    dh = jnp.log(gh / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def legacy_delta2bbox(rois: jnp.ndarray, deltas: jnp.ndarray,
                      means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.),
                      max_shape: Optional[Tuple[int, int]] = None,
                      wh_ratio_clip: float = 16 / 1000) -> jnp.ndarray:
    """MMDet V1.x delta decode (legacy_delta_xywh_bbox_coder.py::
    legacy_delta2bbox): +1 w/h convention; clamps to max_shape - 1."""
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    d = deltas * stds + means
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    max_ratio = jnp.abs(jnp.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0] + 1.0
    ph = rois[..., 3] - rois[..., 1] + 1.0
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def delta_coder_fns(coder_cfg):
    """(encode, decode) pair for a DeltaXYWH-family coder config dict —
    dispatches the MMDet V1.x legacy coder by `type`."""
    if (coder_cfg or {}).get("type") == "LegacyDeltaXYWHBBoxCoder":
        return legacy_bbox2delta, legacy_delta2bbox
    return bbox2delta, delta2bbox


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
    # fork clamps to (w-1, h-1), not (w, h) — transforms.py:52-55
    th, tw = tile_shape[0], tile_shape[1]
    clipped = jnp.stack([
        jnp.clip(shifted[..., 0], 0, tw - 1),
        jnp.clip(shifted[..., 1], 0, th - 1),
        jnp.clip(shifted[..., 2], 0, tw - 1),
        jnp.clip(shifted[..., 3], 0, th - 1)], axis=-1)
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


# --------------------------------------------------------------------------
# Bucketing (side-aware) box coder — SABL
# Parity: mmdet core/bbox/coder/bucketing_bbox_coder.py (generat_buckets :95,
# bbox2bucket :144, bucket2bbox :268). Fully vectorized: the reference's
# per-k scatter loops become one-hot masked sums over the static side_num.
# --------------------------------------------------------------------------

def bbox_rescale_center(bboxes: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    """Rescale boxes about their centers (mmdet core/bbox/transforms.py)."""
    cx = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
    cy = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
    w = (bboxes[..., 2] - bboxes[..., 0]) * scale_factor
    h = (bboxes[..., 3] - bboxes[..., 1]) * scale_factor
    return jnp.stack([cx - w * 0.5, cy - h * 0.5,
                      cx + w * 0.5, cy + h * 0.5], -1)


def _bucket_edges(proposals: jnp.ndarray, num_buckets: int,
                  scale_factor: float):
    side = int(np.ceil(num_buckets / 2.0))
    p = bbox_rescale_center(proposals, scale_factor)
    pw = p[..., 2] - p[..., 0]
    ph = p[..., 3] - p[..., 1]
    bw = pw / num_buckets
    bh = ph / num_buckets
    steps = 0.5 + jnp.arange(side, dtype=proposals.dtype)
    l = p[..., 0:1] + steps * bw[..., None]
    r = p[..., 2:3] - steps * bw[..., None]
    t = p[..., 1:2] + steps * bh[..., None]
    d = p[..., 3:4] - steps * bh[..., None]
    return bw, bh, l, r, t, d


def bbox2bucket(proposals: jnp.ndarray, gt: jnp.ndarray, num_buckets: int,
                scale_factor: float, offset_topk: int = 2,
                offset_upperbound: float = 1.0,
                cls_ignore_neighbor: bool = True):
    """(N, 4) proposals + matched gts -> SABL targets.

    Returns offsets, offset_weights, bucket_labels, bucket_cls_weights, each
    (N, 4 * side_num) with side order [l, r, t, d].
    """
    side = int(np.ceil(num_buckets / 2.0))
    bw, bh, lb, rb, tb, db = _bucket_edges(proposals, num_buckets,
                                           scale_factor)
    offs = jnp.concatenate([
        (lb - gt[..., 0:1]) / bw[..., None],
        (rb - gt[..., 2:3]) / bw[..., None],
        (tb - gt[..., 1:2]) / bh[..., None],
        (db - gt[..., 3:4]) / bh[..., None]], -1)       # (N, 4*side)
    per_side = offs.reshape(*offs.shape[:-1], 4, side)
    a = jnp.abs(per_side)
    topk_vals, topk_idx = jax.lax.top_k(-a, offset_topk)  # smallest |off|
    topk_vals = -topk_vals
    w = jnp.zeros_like(per_side)
    for k in range(offset_topk):
        hit = jax.nn.one_hot(topk_idx[..., k], side, dtype=offs.dtype)
        gate = 1.0 if k == 0 else (
            topk_vals[..., k] < offset_upperbound).astype(offs.dtype)[..., None]
        w = w + hit * gate
    offset_weights = w.reshape(offs.shape)
    labels = jax.nn.one_hot(topk_idx[..., 0], side, dtype=offs.dtype)
    bucket_labels = labels.reshape(offs.shape)
    cls_w = (a < 1.0).astype(offs.dtype).reshape(offs.shape)
    if cls_ignore_neighbor:
        cls_w = (~((cls_w == 1) & (bucket_labels == 0))).astype(offs.dtype)
    else:
        cls_w = jnp.ones_like(cls_w)
    return offs, offset_weights, bucket_labels, cls_w


def bucket2bbox(proposals: jnp.ndarray, cls_preds: jnp.ndarray,
                offset_preds: jnp.ndarray, num_buckets: int,
                scale_factor: float = 1.0, max_shape=None):
    """Decode SABL predictions -> (boxes (N, 4), loc_confidence (N,))."""
    side = int(np.ceil(num_buckets / 2.0))
    n = proposals.shape[0]
    scores = jax.nn.softmax(cls_preds.reshape(n, 4, side), -1)
    top2, lab2 = jax.lax.top_k(scores, 2)                # (N, 4, 2)
    lab0 = lab2[..., 0]                                  # (N, 4) [l,r,t,d]
    bw, bh, *_ = _bucket_edges(proposals, num_buckets, scale_factor)
    p = bbox_rescale_center(proposals, scale_factor)
    fl = lab0.astype(proposals.dtype)
    l_b = p[:, 0] + (0.5 + fl[:, 0]) * bw
    r_b = p[:, 2] - (0.5 + fl[:, 1]) * bw
    t_b = p[:, 1] + (0.5 + fl[:, 2]) * bh
    d_b = p[:, 3] - (0.5 + fl[:, 3]) * bh
    offs = offset_preds.reshape(n, 4, side)
    sel = jnp.take_along_axis(offs, lab0[..., None], -1)[..., 0]  # (N, 4)
    x1 = l_b - sel[:, 0] * bw
    x2 = r_b - sel[:, 1] * bw
    y1 = t_b - sel[:, 2] * bh
    y2 = d_b - sel[:, 3] * bh
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    boxes = jnp.stack([x1, y1, x2, y2], -1)
    neighbor = (jnp.abs(lab2[..., 0] - lab2[..., 1]) == 1)
    conf = top2[..., 0] + top2[..., 1] * neighbor.astype(top2.dtype)
    return boxes, conf.mean(-1)
