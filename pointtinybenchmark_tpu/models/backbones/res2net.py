"""Res2Net backbone.

Parity target: mmdet models/backbones/res2net.py — Bottle2neck replaces
the bottleneck 3x3 with a hierarchical multi-scale cascade: the 1x1 output
splits into `scales` groups; group i's 3x3 conv input adds group i-1's
output (except in downsampling "stage" blocks, where each group convolves
independently and the last group is average-pooled instead).

TPU notes: the per-scale 3x3 convs are small but static — XLA fuses the
split/concat; NHWC layout throughout like resnet.py.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES
from .resnet import ARCH_SETTINGS, ResNet

__all__ = ["Res2Net"]


class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    scales: int = 4
    base_width: int = 26
    dtype: Any = jnp.float32
    norm_use_running_average: bool = True

    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        identity = x
        width = max(int(self.planes * self.base_width / 64), 1)
        mid = width * self.scales
        ra = self.norm_use_running_average

        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=ra, dtype=self.dtype)(y)
        y = nn.relu(y)

        # "stage" block: stride>1 or channel change — groups convolve
        # independently (no hierarchical addition), last group avg-pools
        is_stage = self.downsample
        splits = jnp.split(y, self.scales, axis=-1)
        outs = []
        sp = None
        for i in range(self.scales - 1):
            inp = splits[i] if (is_stage or sp is None) else splits[i] + sp
            sp = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                         padding=1, use_bias=False, dtype=self.dtype,
                         name=f"conv_s{i}")(inp)
            sp = nn.BatchNorm(use_running_average=ra,
                              dtype=self.dtype)(sp)
            sp = nn.relu(sp)
            outs.append(sp)
        last = splits[-1]
        if is_stage:
            last = nn.avg_pool(last, (3, 3),
                               strides=(self.stride, self.stride),
                               padding=((1, 1), (1, 1)))
        outs.append(last)
        y = jnp.concatenate(outs, -1)

        y = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=ra, dtype=self.dtype)(y)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            identity = nn.BatchNorm(use_running_average=ra,
                                    dtype=self.dtype)(identity)
        return nn.relu(y + identity)


@BACKBONES.register_module()
class Res2Net(ResNet):
    """Res2Net-50/101 (scales=4, base_width=26 by default)."""
    scales: int = 4
    res2_base_width: int = 26

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, stage_blocks = ARCH_SETTINGS[self.depth]
        use_ra = (not train) or self.norm_eval

        x = nn.Conv(self.base_channels, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=use_ra, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = self.base_channels
        in_ch = self.base_channels
        for i in range(self.num_stages):
            for j in range(stage_blocks[i]):
                s = self.strides[i] if j == 0 else 1
                need_down = (j == 0) and (s != 1 or in_ch != planes * 4)
                x = Bottle2neck(planes=planes, stride=s,
                                downsample=need_down, scales=self.scales,
                                base_width=self.res2_base_width,
                                dtype=self.dtype,
                                norm_use_running_average=use_ra,
                                name=f"layer{i + 1}_block{j}")(x)
                in_ch = planes * 4
            if i in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
