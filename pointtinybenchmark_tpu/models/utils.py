"""Shared model building blocks (ConvModule analog, init helpers)."""
from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ConvModule", "bias_init_with_prob"]


def bias_init_with_prob(prior_prob: float) -> float:
    """Bias so sigmoid(bias) == prior_prob (RetinaNet focal init)."""
    return float(-math.log((1 - prior_prob) / prior_prob))


class ConvModule(nn.Module):
    """conv -> (norm) -> (relu), NHWC. mmcv ConvModule analog."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    norm: Optional[str] = None      # None | 'GN' | 'BN'
    num_groups: int = 32
    act: bool = True
    use_bias: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = self.use_bias if self.use_bias is not None else self.norm is None
        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride), padding=self.padding,
                    use_bias=use_bias, dtype=self.dtype)(x)
        if self.norm == "GN":
            x = nn.GroupNorm(num_groups=self.num_groups, dtype=self.dtype)(x)
        elif self.norm == "BN":
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        if self.act:
            x = nn.relu(x)
        return x
