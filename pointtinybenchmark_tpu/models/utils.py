"""Shared model building blocks (ConvModule analog, init helpers)."""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
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
            x = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                             dtype=self.dtype)(x)
        elif self.norm == "BN":
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        if self.act:
            x = nn.relu(x)
        return x


class WSConv(nn.Module):
    """Weight-standardized conv (mmcv ConvWS2d, reference configs/gn+ws):
    the kernel is standardized over its (kh, kw, in) axes before the conv —
    pairs with GroupNorm for batch-independent training."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 1
    feature_group_count: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin = x.shape[-1] // self.feature_group_count
        w = self.param("kernel", nn.initializers.he_normal(),
                       (kh, kw, cin, self.features))
        mean = w.mean((0, 1, 2), keepdims=True)
        std = w.std((0, 1, 2), keepdims=True) + 1e-5
        # gain calibrated to he-init std: plain WS leaves unit-variance
        # weights, which under this zoo's frozen-BN blocks would amplify
        # activations ~sqrt(kh*kw*cin)x per layer (the reference pairs WS
        # with active GN, which re-normalizes; same calibration as
        # SAConv2d's AWS gamma)
        he_std = float(math.sqrt(2.0 / (kh * kw * cin)))
        gamma = self.param("gamma", nn.initializers.constant(he_std),
                           (1, 1, 1, self.features))
        w = (gamma * (w - mean) / std).astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, self.strides,
            [(self.padding, self.padding)] * 2,
            feature_group_count=self.feature_group_count,
            dimension_numbers=dn)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,)).astype(self.dtype)
            y = y + b
        return y
