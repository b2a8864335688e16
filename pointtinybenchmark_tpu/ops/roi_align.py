"""RoIAlign as XLA gathers (TPU-native; no custom CUDA).

Parity target: mmcv.ops.RoIAlign with `aligned=True` as configured by the
reference (e.g. TOV_mmdetection/configs2/TinyPerson/base/
faster_rcnn_r50_fpn_1x_TinyPerson640.py:45, roi_layer=dict(type='RoIAlign',
output_size=7, sampling_ratio=0)).

Deviation (documented): mmcv's `sampling_ratio=0` means an *adaptive* number
of samples per bin (ceil(roi_size/out_size)); that is data-dependent and
XLA-hostile, so we use a static `sampling_ratio` (default 2, the de-facto
value for typical RoI sizes). Numerics differ at most by sub-bin sampling
density; models are retrained in this framework so exact kernel parity is
not required (SURVEY.md §7.3 item 4).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["roi_align", "roi_align_multilevel"]


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned"))
def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, spatial_scale: float,
              output_size: int = 7, sampling_ratio: int = 2,
              aligned: bool = True) -> jnp.ndarray:
    """RoIAlign.

    Args:
        feat: (B, H, W, C) feature map (NHWC).
        rois: (R, 5) — (batch_idx, x1, y1, x2, y2) in input-image coords.
        spatial_scale: feature stride reciprocal (e.g. 1/4 for P2).
        output_size: output bin grid (out x out).
        sampling_ratio: static samples per bin side.
        aligned: half-pixel alignment (mmcv aligned=True).
    Returns:
        (R, output_size, output_size, C)
    """
    b, h, w, c = feat.shape
    r = rois.shape[0]
    out = output_size
    sr = sampling_ratio

    batch_idx = rois[:, 0].astype(jnp.int32)
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 1] * spatial_scale - offset
    y1 = rois[:, 2] * spatial_scale - offset
    x2 = rois[:, 3] * spatial_scale - offset
    y2 = rois[:, 4] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:  # legacy: force min size 1
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    bin_w = roi_w / out  # (R,)
    bin_h = roi_h / out

    # Sample-point grid per ROI: (out*sr) points per side.
    # point j (0-based) inside bin i: x1 + (i + (j+0.5)/sr) * bin_w
    side = jnp.arange(out * sr, dtype=feat.dtype)
    frac = (side // sr) + ((side % sr) + 0.5) / sr  # (out*sr,)
    sx = x1[:, None] + frac[None, :] * bin_w[:, None]  # (R, out*sr)
    sy = y1[:, None] + frac[None, :] * bin_h[:, None]

    # Bilinear sampling with mmcv border semantics: a sample is zero when its
    # coord is outside [-1, dim]; indices are clamped into range otherwise.
    # Memory note: indexing feat[batch_idx] under vmap materializes a per-ROI
    # copy of the full feature map ((R, H, W, C) — tens of GB at production
    # shapes), so instead gather sample points directly from the flattened
    # (B*H*W, C) map with batch-offset global indices: peak footprint is the
    # gathered points (R, S, S, C) only.
    s = out * sr
    xg = jnp.broadcast_to(sx[:, None, :], (r, s, s))     # x varies along j
    yg = jnp.broadcast_to(sy[:, :, None], (r, s, s))     # y varies along i
    inb = (xg >= -1.0) & (xg <= w) & (yg >= -1.0) & (yg <= h)
    xc = jnp.clip(xg, 0.0, w - 1.0)
    yc = jnp.clip(yg, 0.0, h - 1.0)
    x0 = jnp.floor(xc)
    y0 = jnp.floor(yc)
    x1i = jnp.minimum(x0 + 1, w - 1).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, h - 1).astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    wx1 = (xc - x0).astype(feat.dtype)
    wy1 = (yc - y0).astype(feat.dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    flat = feat.reshape(b * h * w, c)
    base = (batch_idx * (h * w))[:, None, None]          # (R, 1, 1)

    def g(yi, xi):
        idx = (base + yi * w + xi).reshape(-1)
        return flat[idx].reshape(r, s, s, c)

    val = (g(y0i, x0i) * (wy0 * wx0)[..., None]
           + g(y0i, x1i) * (wy0 * wx1)[..., None]
           + g(y1i, x0i) * (wy1 * wx0)[..., None]
           + g(y1i, x1i) * (wy1 * wx1)[..., None])
    val = jnp.where(inb[..., None], val, 0.0)
    # Average sr x sr samples per bin.
    return val.reshape(r, out, sr, out, sr, c).mean(axis=(2, 4))


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                   "aligned", "strides"))
def roi_align_multilevel(feats, rois: jnp.ndarray, lvls: jnp.ndarray,
                         strides, output_size: int = 7,
                         sampling_ratio: int = 2,
                         aligned: bool = True) -> jnp.ndarray:
    """RoIAlign from a per-roi FPN level with ONE gather.

    Equivalent to running `roi_align` on every level and one-hot-selecting
    by `lvls` (the SingleRoIExtractor semantics), but all level maps are
    flattened into one (sum_l B*H_l*W_l, C) buffer and each roi's sample
    indices are offset into its assigned level — 1/num_levels of the
    gather traffic of the select formulation (the RoI-stage bottleneck at
    production shapes; PARITY.md round-2 perf notes).

    Args:
        feats: tuple of per-level (B, H_l, W_l, C) maps (same B, C).
        rois: (R, 5) (batch_idx, x1, y1, x2, y2) in input-image coords.
        lvls: (R,) int32 assigned level per roi.
        strides: static tuple of per-level feature strides.
    """
    b, _, _, c = feats[0].shape
    r = rois.shape[0]
    out = output_size
    sr = sampling_ratio
    n_lvl = len(feats)
    dtype = feats[0].dtype

    hs = jnp.asarray([f.shape[1] for f in feats], jnp.int32)
    ws = jnp.asarray([f.shape[2] for f in feats], jnp.int32)
    sizes = [f.shape[1] * f.shape[2] for f in feats]
    bases = np.cumsum([0] + [b * s for s in sizes])[:n_lvl]
    flat = jnp.concatenate([f.reshape(b * s, c)
                            for f, s in zip(feats, sizes)], axis=0)

    scale = 1.0 / jnp.asarray(strides, dtype)[lvls]          # (R,)
    h_r = hs[lvls]                                            # (R,)
    w_r = ws[lvls]
    hw_r = (h_r * w_r).astype(jnp.int32)
    base_r = (jnp.asarray(bases, jnp.int32)[lvls]
              + rois[:, 0].astype(jnp.int32) * hw_r)          # (R,)

    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 1] * scale - offset
    y1 = rois[:, 2] * scale - offset
    x2 = rois[:, 3] * scale - offset
    y2 = rois[:, 4] * scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / out
    bin_h = roi_h / out

    side = jnp.arange(out * sr, dtype=dtype)
    frac = (side // sr) + ((side % sr) + 0.5) / sr
    sx = x1[:, None] + frac[None, :] * bin_w[:, None]         # (R, S)
    sy = y1[:, None] + frac[None, :] * bin_h[:, None]

    s = out * sr
    xg = jnp.broadcast_to(sx[:, None, :], (r, s, s))
    yg = jnp.broadcast_to(sy[:, :, None], (r, s, s))
    wf = w_r.astype(dtype)[:, None, None]
    hf = h_r.astype(dtype)[:, None, None]
    inb = (xg >= -1.0) & (xg <= wf) & (yg >= -1.0) & (yg <= hf)
    xc = jnp.clip(xg, 0.0, wf - 1.0)
    yc = jnp.clip(yg, 0.0, hf - 1.0)
    x0 = jnp.floor(xc)
    y0 = jnp.floor(yc)
    x1i = jnp.minimum(x0 + 1, wf - 1).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, hf - 1).astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    wx1 = (xc - x0).astype(dtype)
    wy1 = (yc - y0).astype(dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    # Four single-row (1, C) takes from the flat multilevel buffer — the
    # fastest gather formulation measured on TPU v5e at production shapes
    # (PARITY.md round-2 perf notes: 4x row-takes 141 ms vs (2,1,C)
    # pair-gathers 254 ms vs a lax.map-chunked (2,2,C) quad-slice gather
    # 9.7 s for R=24k, S=14, C=256 — multi-row slice gathers fall off the
    # TPU fast-gather path, and single-row takes fuse with the weighted-sum
    # consumer so only the (R, S, S, C) output materializes).
    base_sr = base_r[:, None, None]                          # (R, 1, 1)
    w_sr = w_r[:, None, None]

    def g(yi, xi):
        idx = (base_sr + yi * w_sr + xi).reshape(-1)
        return flat[idx].reshape(r, s, s, c)

    val = (g(y0i, x0i) * (wy0 * wx0)[..., None]
           + g(y0i, x1i) * (wy0 * wx1)[..., None]
           + g(y1i, x0i) * (wy1 * wx0)[..., None]
           + g(y1i, x1i) * (wy1 * wx1)[..., None])
    val = jnp.where(inb[..., None], val, 0.0)
    return val.reshape(r, out, sr, out, sr, c).mean(axis=(2, 4))
