"""MobileNetV2 backbone (flax.linen, NHWC).

Parity target: mmdet models/backbones/mobilenet_v2.py — inverted residual
blocks, out_indices over the 7 stages, width_mult.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES

__all__ = ["MobileNetV2"]

# (expand_ratio, channels, num_blocks, stride)
ARCH = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int
    dtype: Any = jnp.float32
    use_ra: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        use_res = self.stride == 1 and in_ch == self.out_channels
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype)(y)
            y = nn.BatchNorm(use_running_average=self.use_ra,
                             dtype=self.dtype)(y)
            y = nn.relu6(y)
        y = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                    padding=1, feature_group_count=hidden, use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=self.use_ra, dtype=self.dtype)(y)
        y = nn.relu6(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=self.use_ra, dtype=self.dtype)(y)
        return x + y if use_res else y


@BACKBONES.register_module()
class MobileNetV2(nn.Module):
    widen_factor: float = 1.0
    out_indices: Sequence[int] = (1, 2, 4, 6)
    frozen_stages: int = -1
    norm_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_ra = (not train) or self.norm_eval
        ch = _make_divisible(32 * self.widen_factor)
        x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=use_ra, dtype=self.dtype)(x)
        x = nn.relu6(x)
        outs = []
        for i, (t, c, n, s) in enumerate(ARCH):
            out_ch = _make_divisible(c * self.widen_factor)
            for j in range(n):
                x = InvertedResidual(out_ch, s if j == 0 else 1, t,
                                     dtype=self.dtype, use_ra=use_ra,
                                     name=f"layer{i + 1}_block{j}")(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
