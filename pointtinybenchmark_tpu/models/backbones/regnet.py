"""RegNet backbone (RegNetX family).

Parity target: mmdet models/backbones/regnet.py — stage widths/depths from
the quantized linear parameterization (w_j = w0 + wa*j snapped to
multiples via wm), grouped 1-ratio bottlenecks, named arches
(regnetx_400mf .. regnetx_12gf).

TPU notes: group convs map to XLA feature_group_count; widths stay
128-friendly multiples by construction (divisors of group width).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES

__all__ = ["RegNet"]

ARCH_PARAMS = {
    "regnetx_400mf": dict(w0=24, wa=24.48, wm=2.54, depth=22, group_w=16),
    "regnetx_800mf": dict(w0=56, wa=35.73, wm=2.28, depth=16, group_w=16),
    "regnetx_1.6gf": dict(w0=80, wa=34.01, wm=2.25, depth=18, group_w=24),
    "regnetx_3.2gf": dict(w0=88, wa=26.31, wm=2.25, depth=25, group_w=48),
    "regnetx_4.0gf": dict(w0=96, wa=38.65, wm=2.43, depth=23, group_w=40),
    "regnetx_6.4gf": dict(w0=184, wa=60.83, wm=2.07, depth=17, group_w=56),
    "regnetx_8.0gf": dict(w0=80, wa=49.56, wm=2.88, depth=23, group_w=120),
    "regnetx_12gf": dict(w0=168, wa=73.36, wm=2.37, depth=19, group_w=112),
}


def generate_regnet(w0: float, wa: float, wm: float, depth: int,
                    divisor: int = 8):
    """Quantized linear widths -> per-stage (widths, depths)."""
    ws_cont = np.arange(depth) * wa + w0
    ks = np.round(np.log(ws_cont / w0) / np.log(wm))
    ws = w0 * np.power(wm, ks)
    ws = np.round(ws / divisor) * divisor
    ws = ws.astype(int)
    widths, depths = [], []
    for w in ws:
        if not widths or widths[-1] != w:
            widths.append(int(w))
            depths.append(1)
        else:
            depths[-1] += 1
    return widths, depths


def _adjust(widths, group_w):
    """Snap widths to multiples of the group width (reference
    adjust_width_group)."""
    out_w, out_g = [], []
    for w in widths:
        g = min(group_w, w)
        w = int(round(w / g) * g)
        out_w.append(w)
        out_g.append(g)
    return out_w, out_g


class RegBlock(nn.Module):
    width: int
    stride: int = 1
    group_width: int = 16
    downsample: bool = False
    dtype: Any = jnp.float32
    norm_use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        identity = x
        ra = self.norm_use_running_average
        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=ra, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.width, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype,
                    feature_group_count=max(self.width
                                            // self.group_width, 1))(y)
        y = nn.BatchNorm(use_running_average=ra, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=ra, dtype=self.dtype)(y)
        if self.downsample:
            identity = nn.Conv(self.width, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            identity = nn.BatchNorm(use_running_average=ra,
                                    dtype=self.dtype)(identity)
        return nn.relu(y + identity)


@BACKBONES.register_module()
class RegNet(nn.Module):
    arch: Any = "regnetx_400mf"   # name or dict(w0, wa, wm, depth, group_w)
    stem_channels: int = 32
    out_indices: Sequence[int] = (0, 1, 2, 3)
    strides: Sequence[int] = (2, 2, 2, 2)
    frozen_stages: int = -1
    norm_eval: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        arch = (dict(ARCH_PARAMS[self.arch]) if isinstance(self.arch, str)
                else dict(self.arch))
        widths, depths = generate_regnet(arch["w0"], arch["wa"],
                                         arch["wm"], arch["depth"])
        widths, groups = _adjust(widths, arch["group_w"])
        ra = (not train) or self.norm_eval

        x = nn.Conv(self.stem_channels, (3, 3), strides=(2, 2), padding=1,
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=ra, dtype=self.dtype,
                         name="stem_bn")(x)
        x = nn.relu(x)

        outs = []
        in_ch = self.stem_channels
        for i, (w, d, g) in enumerate(zip(widths, depths, groups)):
            for j in range(d):
                s = self.strides[i] if j == 0 else 1
                need_down = (j == 0) and (s != 1 or in_ch != w)
                x = RegBlock(width=w, stride=s, group_width=g,
                             downsample=need_down, dtype=self.dtype,
                             norm_use_running_average=ra,
                             name=f"layer{i + 1}_block{j}")(x)
                in_ch = w
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
