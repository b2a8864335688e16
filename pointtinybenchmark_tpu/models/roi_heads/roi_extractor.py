"""Multi-level RoI feature extraction.

Parity target: mmdet models/roi_heads/roi_extractors/
single_level_roi_extractor.py (SingleRoIExtractor): each RoI is assigned to
an FPN level by `floor(log2(sqrt(area) / finest_scale + 1e-6))` clamped to
the level range, then RoIAligned from that level.

TPU design: data-dependent level routing with static shapes — all level
maps are flattened into ONE buffer and each roi gathers from its assigned
level via a global index offset (ops/roi_align.py::roi_align_multilevel).
Numerically identical to align-on-every-level + one-hot select, at 1/4 of
the gather traffic (the RoI-stage bottleneck; PARITY.md round-2 perf).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ...ops.roi_align import roi_align, roi_align_multilevel

__all__ = ["single_roi_extract", "generic_roi_extract", "map_roi_levels"]


def map_roi_levels(rois: jnp.ndarray, num_levels: int,
                   finest_scale: float = 56.0) -> jnp.ndarray:
    """rois: (R, 5) -> (R,) int32 level index."""
    w = rois[:, 3] - rois[:, 1]
    h = rois[:, 4] - rois[:, 2]
    scale = jnp.sqrt(jnp.clip(w * h, 0, None))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def single_roi_extract(feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                       featmap_strides: Sequence[int],
                       output_size: int = 7, sampling_ratio: int = 2,
                       finest_scale: float = 56.0,
                       aligned: bool = True,
                       use_pallas: bool = False) -> jnp.ndarray:
    """feats: per-level (B, H, W, C); rois (R, 5) -> (R, out, out, C).

    `use_pallas=True` (opt-in, TPU only, C % 128 == 0) routes the forward
    through the window-DMA MXU kernel (ops/roi_align_pallas.py) — identical
    numerics (golden-tested), one contiguous copy per roi instead of
    R*S*S*4 random row gathers; backward still uses the XLA gather VJP.
    """
    num_levels = len(featmap_strides)
    lvls = map_roi_levels(rois, num_levels, finest_scale)
    if use_pallas and feats[0].shape[-1] % 128 == 0:
        from ...ops.roi_align_pallas import roi_align_multilevel_pallas
        return roi_align_multilevel_pallas(tuple(feats), rois, lvls,
                                           tuple(featmap_strides),
                                           output_size, sampling_ratio,
                                           aligned)
    return roi_align_multilevel(tuple(feats), rois, lvls,
                                tuple(featmap_strides), output_size,
                                sampling_ratio, aligned)


def generic_roi_extract(feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                        featmap_strides: Sequence[int],
                        output_size: int = 7, sampling_ratio: int = 2,
                        aggregation: str = "sum") -> jnp.ndarray:
    """GRoIE-style extraction (mmdet models/roi_heads/roi_extractors/
    generic_roi_extractor.py): RoIAlign every RoI from EVERY pyramid level
    and aggregate (sum / concat) instead of routing to one level. On TPU
    this is the same all-level gather as single_roi_extract minus the
    one-hot select — the 'extra' work the reference pays for GRoIE is the
    default cost structure here."""
    outs = [roi_align(feat, rois, 1.0 / stride, output_size, sampling_ratio)
            for feat, stride in zip(feats, featmap_strides)]
    if aggregation == "concat":
        return jnp.concatenate(outs, axis=-1)
    return sum(outs)
