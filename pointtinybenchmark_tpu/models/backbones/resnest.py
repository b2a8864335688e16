"""ResNeSt backbone (split-attention networks).

Parity target: mmdet models/backbones/resnest.py — SplitAttentionConv2d
(radix-grouped 3x3 whose outputs are recombined by an rSoftMax-gated sum),
`avd` average-pool downsampling before the 3x3, avg-down shortcuts.

TPU notes: the radix recombination is a reshape + softmax + weighted-sum —
pure elementwise/reduction ops XLA fuses behind the grouped conv.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES
from .resnet import ARCH_SETTINGS, ResNet

__all__ = ["ResNeSt"]


class SplitAttentionConv(nn.Module):
    channels: int          # output width per radix group
    radix: int = 2
    groups: int = 1
    reduction_factor: int = 4
    dtype: Any = jnp.float32
    norm_ra: bool = True

    @nn.compact
    def __call__(self, x):
        r, c = self.radix, self.channels
        y = nn.Conv(c * r, (3, 3), padding=1, use_bias=False,
                    feature_group_count=self.groups * r, dtype=self.dtype,
                    name="conv")(x)
        y = nn.BatchNorm(use_running_average=self.norm_ra,
                         dtype=self.dtype, name="bn0")(y)
        y = nn.relu(y)
        b, h, w, _ = y.shape
        splits = y.reshape(b, h, w, r, c)
        gap = splits.sum(3).mean((1, 2))                    # (B, C)
        inter = max(c * r // self.reduction_factor, 32)
        g = nn.Dense(inter, dtype=self.dtype, name="fc1")(gap)
        g = nn.relu(nn.BatchNorm(use_running_average=self.norm_ra,
                                 dtype=self.dtype, name="bn1")(g))
        att = nn.Dense(c * r, dtype=self.dtype, name="fc2")(g)
        att = jnp.transpose(att.reshape(b, r, c), (0, 2, 1))   # (B, C, R)
        att = jnp.transpose(nn.softmax(att, axis=-1), (0, 2, 1))  # rSoftMax
        return (splits * att[:, None, None, :, :]).sum(3)   # (B, H, W, C)


class SplitBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    radix: int = 2
    groups: int = 1
    base_width: int = 4
    avg_down_stride: bool = True    # 'avd' in the reference
    dtype: Any = jnp.float32
    norm_ra: bool = True

    @nn.compact
    def __call__(self, x):
        identity = x
        width = int(self.planes * (self.base_width / 64)) * self.groups \
            if self.groups > 1 else self.planes
        ra = self.norm_ra
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=ra, dtype=self.dtype)(y)
        y = nn.relu(y)
        if self.stride > 1 and self.avg_down_stride:
            y = nn.avg_pool(y, (3, 3), strides=(self.stride, self.stride),
                            padding=((1, 1), (1, 1)))
        y = SplitAttentionConv(channels=width, radix=self.radix,
                               groups=self.groups, dtype=self.dtype,
                               norm_ra=ra, name="splat")(y)
        if self.stride > 1 and not self.avg_down_stride:
            y = nn.avg_pool(y, (3, 3), strides=(self.stride, self.stride),
                            padding=((1, 1), (1, 1)))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=ra, dtype=self.dtype)(y)
        if self.downsample:
            # avg-down shortcut (ResNet-D style, reference avg_down=True)
            if self.stride > 1:
                identity = nn.avg_pool(identity,
                                       (self.stride, self.stride),
                                       strides=(self.stride, self.stride))
            identity = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                               dtype=self.dtype)(identity)
            identity = nn.BatchNorm(use_running_average=ra,
                                    dtype=self.dtype)(identity)
        return nn.relu(y + identity)


@BACKBONES.register_module()
class ResNeSt(ResNet):
    """ResNeSt-50/101 (radix=2, deep stem omitted — 7x7 stem like ResNet)."""
    radix: int = 2
    resnest_groups: int = 1
    resnest_base_width: int = 4

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
                x = SplitBottleneck(planes=planes, stride=s,
                                    downsample=need_down, radix=self.radix,
                                    groups=self.resnest_groups,
                                    base_width=self.resnest_base_width,
                                    dtype=self.dtype,
                                    norm_ra=use_ra,
                                    name=f"layer{i + 1}_block{j}")(x)
                in_ch = planes * 4
            if i in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
