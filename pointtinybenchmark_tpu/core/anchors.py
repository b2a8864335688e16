"""Anchor and point grid generators.

Parity target: TOV_mmdetection/mmdet/core/anchor/anchor_generator.py
(AnchorGenerator incl. octave scales used by RetinaNet) and
point_generator.py:7-37 (PointGenerator returning (x, y, stride) grids).

All generation is host-side numpy at trace time (featmap sizes are static
under jit), returned as numpy arrays (JAX treats them as constants; converting to
jnp inside a trace would create tracers) — the grids become compile-time constants
folded into the XLA program.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..utils.registry import ANCHOR_GENERATORS

__all__ = ["AnchorGenerator", "PointGenerator", "SSDAnchorGenerator",
           "LegacyAnchorGenerator", "LegacySSDAnchorGenerator"]


@ANCHOR_GENERATORS.register_module()
class AnchorGenerator:
    """Multi-level anchor grids (mmdet v2 semantics).

    Reference behavior: base anchors centered at (0,0) (center_offset=0),
    w/h from base_size * scale * sqrt-ratio; octave scales via
    octave_base_scale * 2**(i/scales_per_octave). The tiny-object "Adap"
    recipe shrinks octave_base_scale to 2 (SURVEY.md §2.2).
    """

    def __init__(self,
                 strides: Sequence[int],
                 ratios: Sequence[float],
                 scales: Optional[Sequence[float]] = None,
                 base_sizes: Optional[Sequence[int]] = None,
                 scale_major: bool = True,
                 octave_base_scale: Optional[float] = None,
                 scales_per_octave: Optional[int] = None,
                 center_offset: float = 0.0):
        self.strides = [(s, s) if isinstance(s, int) else tuple(s) for s in strides]
        self.base_sizes = (list(base_sizes) if base_sizes is not None
                           else [min(s) for s in self.strides])
        assert scales is not None or octave_base_scale is not None
        if scales is not None:
            self.scales = np.asarray(scales, np.float32)
        else:
            octave_scales = 2 ** (np.arange(scales_per_octave) / scales_per_octave)
            self.scales = (octave_scales * octave_base_scale).astype(np.float32)
        self.octave_base_scale = octave_base_scale
        self.scales_per_octave = scales_per_octave
        self.ratios = np.asarray(ratios, np.float32)
        self.scale_major = scale_major
        self.center_offset = center_offset
        self.base_anchors = [
            self._single_level_base_anchors(bs, stride)
            for bs, stride in zip(self.base_sizes, self.strides)
        ]

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    @property
    def num_base_anchors(self) -> List[int]:
        return [a.shape[0] for a in self.base_anchors]

    def _single_level_base_anchors(self, base_size: float, stride) -> np.ndarray:
        w = h = float(base_size)
        x_c = self.center_offset * stride[0]
        y_c = self.center_offset * stride[1]
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        else:
            ws = (w * self.scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * self.scales[:, None] * h_ratios[None, :]).reshape(-1)
        return np.stack([x_c - 0.5 * ws, y_c - 0.5 * hs,
                         x_c + 0.5 * ws, y_c + 0.5 * hs], axis=-1).astype(np.float32)

    def single_level_grid_anchors(self, featmap_size: Tuple[int, int], level: int) -> np.ndarray:
        """(H*W*A, 4) anchors for one level (row-major over the grid)."""
        h, w = featmap_size
        sx, sy = self.strides[level]
        shift_x = np.arange(w, dtype=np.float32) * sx
        shift_y = np.arange(h, dtype=np.float32) * sy
        xx, yy = np.meshgrid(shift_x, shift_y)
        shifts = np.stack([xx.ravel(), yy.ravel(), xx.ravel(), yy.ravel()], axis=-1)
        anchors = (self.base_anchors[level][None, :, :] + shifts[:, None, :])
        return anchors.reshape(-1, 4)

    def grid_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> List[np.ndarray]:
        assert len(featmap_sizes) == self.num_levels
        return [self.single_level_grid_anchors(fs, i) for i, fs in enumerate(featmap_sizes)]

    def valid_flags(self, featmap_sizes, pad_shape) -> List[np.ndarray]:
        """Anchors whose grid cell lies inside the (unpadded) image."""
        flags = []
        for i, (h, w) in enumerate(featmap_sizes):
            sx, sy = self.strides[i]
            valid_w = min(int(np.ceil(pad_shape[1] / sx)), w)
            valid_h = min(int(np.ceil(pad_shape[0] / sy)), h)
            vx = np.zeros(w, bool); vx[:valid_w] = True
            vy = np.zeros(h, bool); vy[:valid_h] = True
            vv = (vy[:, None] & vx[None, :]).ravel()
            flags.append(np.repeat(vv, self.num_base_anchors[i]))
        return flags


@ANCHOR_GENERATORS.register_module()
class LegacyAnchorGenerator(AnchorGenerator):
    """MMDet V1.x anchor grid (mmdet core/anchor/anchor_generator.py:474):
    centers at center_offset*(base_size-1), corners use the V1.x w/h-1
    pixel convention, and base anchors are rounded to integers."""

    def _single_level_base_anchors(self, base_size: float, stride) -> np.ndarray:
        w = h = float(base_size)
        x_c = self.center_offset * (w - 1)
        y_c = self.center_offset * (h - 1)
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        else:
            ws = (w * self.scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * self.scales[:, None] * h_ratios[None, :]).reshape(-1)
        base = np.stack([x_c - 0.5 * (ws - 1), y_c - 0.5 * (hs - 1),
                         x_c + 0.5 * (ws - 1), y_c + 0.5 * (hs - 1)],
                        axis=-1)
        return np.round(base).astype(np.float32)


@ANCHOR_GENERATORS.register_module()
class PointGenerator:
    """Grid-point generator (mmdet core/anchor/point_generator.py parity).

    grid_points returns (H*W, 3) rows of (x, y, stride) with points at cell
    corners (x = ix * stride), matching the reference exactly.
    """

    def grid_points(self, featmap_size: Tuple[int, int], stride: int) -> np.ndarray:
        h, w = featmap_size
        shift_x = np.arange(0., w, dtype=np.float32) * stride
        shift_y = np.arange(0., h, dtype=np.float32) * stride
        xx, yy = np.meshgrid(shift_x, shift_y)
        ss = np.full_like(xx.ravel(), float(stride))
        return np.stack([xx.ravel(), yy.ravel(), ss], axis=-1)

    def valid_flags(self, featmap_size, valid_size) -> np.ndarray:
        h, w = featmap_size
        vh, vw = valid_size
        vx = np.zeros(w, bool); vx[:vw] = True
        vy = np.zeros(h, bool); vy[:vh] = True
        return (vy[:, None] & vx[None, :]).ravel()


@ANCHOR_GENERATORS.register_module()
class SSDAnchorGenerator:
    """SSD anchor boxes (mmdet core/anchor SSDAnchorGenerator parity,
    simplified surface: explicit per-level min/max sizes + extra ratios).

    Per level: sizes [min, sqrt(min*max)] at ratio 1, plus (r, 1/r) variants
    of the min size for each extra ratio.
    """

    def __init__(self, strides, ratios, min_sizes=None, max_sizes=None,
                 basesize_ratio_range=None, input_size: int = 300,
                 scale_major: bool = False, center_offset: float = 0.5):
        self.strides = [(s, s) if isinstance(s, int) else tuple(s)
                        for s in strides]
        self.ratios = [list(r) for r in ratios]
        if min_sizes is None:
            # mmdet surface (anchor_generator.py:366-417): derive per-level
            # min/max sizes from basesize_ratio_range + input_size.
            assert basesize_ratio_range is not None
            mn_r = int(basesize_ratio_range[0] * 100)
            mx_r = int(basesize_ratio_range[1] * 100)
            n = len(self.strides)
            step = int(np.floor(mx_r - mn_r) / (n - 2))
            min_sizes, max_sizes = [], []
            for ratio in range(mn_r, mx_r + 1, step):
                min_sizes.append(int(input_size * ratio / 100))
                max_sizes.append(int(input_size * (ratio + step) / 100))
            first = {  # (input_size, first basesize ratio) -> head sizes
                (300, 15): (7, 15), (300, 20): (10, 20),
                (512, 10): (4, 10), (512, 15): (7, 15)}
            key = (int(input_size), mn_r)
            assert key in first, (
                f"unsupported SSD basesize_ratio_range {basesize_ratio_range}"
                f" for input_size {input_size}")
            min_sizes.insert(0, int(input_size * first[key][0] / 100))
            max_sizes.insert(0, int(input_size * first[key][1] / 100))
        self.min_sizes = list(min_sizes)
        self.max_sizes = list(max_sizes)
        self.center_offset = center_offset
        self.base_anchors = [self._level_base(i)
                             for i in range(len(self.strides))]

    @property
    def num_levels(self):
        return len(self.strides)

    @property
    def num_base_anchors(self):
        return [len(a) for a in self.base_anchors]

    def _level_base(self, i) -> np.ndarray:
        mn, mx = self.min_sizes[i], self.max_sizes[i]
        cx = self.center_offset * self.strides[i][0]
        cy = self.center_offset * self.strides[i][1]
        whs = [(mn, mn), (np.sqrt(mn * mx), np.sqrt(mn * mx))]
        for r in self.ratios[i]:
            if r == 1:
                continue
            sr = np.sqrt(r)
            whs.append((mn * sr, mn / sr))
            whs.append((mn / sr, mn * sr))
        out = []
        for w, h in whs:
            out.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
        return np.asarray(out, np.float32)

    def single_level_grid_anchors(self, featmap_size, level) -> np.ndarray:
        h, w = featmap_size
        sx, sy = self.strides[level]
        shift_x = np.arange(w, dtype=np.float32) * sx
        shift_y = np.arange(h, dtype=np.float32) * sy
        xx, yy = np.meshgrid(shift_x, shift_y)
        shifts = np.stack([xx.ravel(), yy.ravel(),
                           xx.ravel(), yy.ravel()], -1)
        return (self.base_anchors[level][None] + shifts[:, None]).reshape(-1, 4)

    def grid_anchors(self, featmap_sizes):
        return [self.single_level_grid_anchors(fs, i)
                for i, fs in enumerate(featmap_sizes)]

    def valid_flags(self, featmap_sizes, pad_shape):
        flags = []
        for i, (h, w) in enumerate(featmap_sizes):
            sx, sy = self.strides[i]
            vw = min(int(np.ceil(pad_shape[1] / sx)), w)
            vh = min(int(np.ceil(pad_shape[0] / sy)), h)
            vx = np.zeros(w, bool); vx[:vw] = True
            vy = np.zeros(h, bool); vy[:vh] = True
            vv = (vy[:, None] & vx[None, :]).ravel()
            flags.append(np.repeat(vv, self.num_base_anchors[i]))
        return flags


@ANCHOR_GENERATORS.register_module()
class LegacySSDAnchorGenerator(SSDAnchorGenerator):
    """MMDet V1.x SSD anchors (mmdet anchor_generator.py:573): centers at
    (stride-1)/2 and the V1.x w/h-1 rounded-corner convention."""

    def _level_base(self, i) -> np.ndarray:
        mn, mx = self.min_sizes[i], self.max_sizes[i]
        cx = (self.strides[i][0] - 1) / 2.0
        cy = (self.strides[i][1] - 1) / 2.0
        whs = [(mn, mn), (np.sqrt(mn * mx), np.sqrt(mn * mx))]
        for r in self.ratios[i]:
            if r == 1:
                continue
            sr = np.sqrt(r)
            whs.append((mn * sr, mn / sr))
            whs.append((mn / sr, mn * sr))
        out = [[cx - (w - 1) / 2, cy - (h - 1) / 2,
                cx + (w - 1) / 2, cy + (h - 1) / 2] for w, h in whs]
        return np.round(np.asarray(out, np.float32)).astype(np.float32)
