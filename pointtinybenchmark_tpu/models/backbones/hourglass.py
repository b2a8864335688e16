"""HourglassNet backbone (CornerNet/CenterNet-HG).

Parity target: mmdet models/backbones/hourglass.py — stride-4 stem,
`num_stacks` recursive hourglass modules with skip connections and
inter-stack remapping, every stack emitting a supervision feature.

TPU notes: the recursion unrolls to a static conv graph; downsampling is
stride-2 convs (not maxpool, matching the reference's ResNet-style
HourglassModule), upsampling nearest-neighbour.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES
from .resnet import BasicBlock

__all__ = ["HourglassNet"]


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")


class HourglassModule(nn.Module):
    """One recursive hourglass over `stage_channels`/`stage_blocks`."""
    depth: int
    stage_channels: Sequence[int]
    stage_blocks: Sequence[int]
    dtype: Any = jnp.float32
    norm_ra: bool = True

    @nn.compact
    def __call__(self, x):
        c_cur, c_next = self.stage_channels[0], self.stage_channels[1]
        b_cur, _ = self.stage_blocks[0], self.stage_blocks[1]

        def res_layer(y, ch, n, stride, name):
            for j in range(n):
                s = stride if j == 0 else 1
                need = (j == 0) and (s != 1 or y.shape[-1] != ch)
                y = BasicBlock(planes=ch, stride=s, downsample=need,
                               dtype=self.dtype,
                               norm_use_running_average=self.norm_ra,
                               name=f"{name}_{j}")(y)
            return y

        up1 = res_layer(x, c_cur, b_cur, 1, "up1")
        low1 = res_layer(x, c_next, b_cur, 2, "low1")
        if self.depth > 1:
            low2 = HourglassModule(self.depth - 1, self.stage_channels[1:],
                                   self.stage_blocks[1:], dtype=self.dtype,
                                   norm_ra=self.norm_ra, name="low2")(low1)
        else:
            low2 = res_layer(low1, c_next, b_cur, 1, "low2")
        low3 = res_layer(low2, c_cur, b_cur, 1, "low3")
        return up1 + _up2(low3)


@BACKBONES.register_module()
class HourglassNet(nn.Module):
    downsample_times: int = 5
    num_stacks: int = 2
    stage_channels: Sequence[int] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Sequence[int] = (2, 2, 2, 2, 2, 4)
    feat_channel: int = 256
    norm_eval: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ra = (not train) or self.norm_eval
        c0 = self.stage_channels[0]

        def cbr(y, ch, k, s, name):
            y = nn.Conv(ch, (k, k), strides=(s, s), padding=k // 2,
                        use_bias=False, dtype=self.dtype,
                        name=f"{name}_conv")(y)
            y = nn.BatchNorm(use_running_average=ra, dtype=self.dtype,
                             name=f"{name}_bn")(y)
            return nn.relu(y)

        # stem: conv/2 + res-block/2 -> stride 4
        x = cbr(x, c0 // 2, 7, 2, "stem")
        x = BasicBlock(planes=c0, stride=2, downsample=True,
                       dtype=self.dtype, norm_use_running_average=ra,
                       name="stem_block")(x)

        outs = []
        for i in range(self.num_stacks):
            hg = HourglassModule(self.downsample_times, self.stage_channels,
                                 self.stage_blocks, dtype=self.dtype,
                                 norm_ra=ra, name=f"hg{i}")(x)
            feat = cbr(hg, self.feat_channel, 3, 1, f"out{i}")
            outs.append(feat)
            if i < self.num_stacks - 1:
                # inter-stack remap (reference inters/conv1x1 residual link)
                a = nn.Conv(c0, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f"remap_x{i}")(x)
                a = nn.BatchNorm(use_running_average=ra, dtype=self.dtype,
                                 name=f"remap_x_bn{i}")(a)
                bfeat = nn.Conv(c0, (1, 1), use_bias=False,
                                dtype=self.dtype, name=f"remap_f{i}")(feat)
                bfeat = nn.BatchNorm(use_running_average=ra,
                                     dtype=self.dtype,
                                     name=f"remap_f_bn{i}")(bfeat)
                x = nn.relu(a + bfeat)
                x = BasicBlock(planes=c0, dtype=self.dtype,
                               norm_use_running_average=ra,
                               name=f"inter{i}")(x)
        return tuple(outs)
