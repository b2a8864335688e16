"""Darknet-53 backbone (flax.linen, NHWC).

Parity target: mmdet models/backbones/darknet.py — conv(LeakyReLU) stem,
five stages of [1, 2, 8, 8, 4] residual blocks, out at strides 8/16/32.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES

__all__ = ["Darknet"]


class ConvBNLeaky(nn.Module):
    out_ch: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32
    use_ra: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=(self.kernel - 1) // 2, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=self.use_ra, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.1)


class DarkBlock(nn.Module):
    channels: int
    dtype: Any = jnp.float32
    use_ra: bool = True

    @nn.compact
    def __call__(self, x):
        y = ConvBNLeaky(self.channels // 2, 1, dtype=self.dtype,
                        use_ra=self.use_ra)(x)
        y = ConvBNLeaky(self.channels, 3, dtype=self.dtype,
                        use_ra=self.use_ra)(y)
        return x + y


@BACKBONES.register_module()
class Darknet(nn.Module):
    depth: int = 53
    out_indices: Sequence[int] = (3, 4, 5)
    frozen_stages: int = -1
    norm_eval: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.depth == 53
        use_ra = (not train) or self.norm_eval
        blocks = (1, 2, 8, 8, 4)
        channels = (64, 128, 256, 512, 1024)
        x = ConvBNLeaky(32, 3, dtype=self.dtype, use_ra=use_ra,
                        name="stem")(x)
        outs = []
        for i, (nb, ch) in enumerate(zip(blocks, channels)):
            x = ConvBNLeaky(ch, 3, stride=2, dtype=self.dtype, use_ra=use_ra,
                            name=f"down{i + 1}")(x)
            for j in range(nb):
                x = DarkBlock(ch, dtype=self.dtype, use_ra=use_ra,
                              name=f"stage{i + 1}_block{j}")(x)
            if (i + 1) in self.out_indices:
                outs.append(x)
        return tuple(outs)
