"""Deformable convolution as gathers + one dense contraction.

Parity target: mmcv ops DeformConv2d / ModulatedDeformConv2d (used by the
reference's `dcn=dict(type='DCN'/'DCNv2')` backbone stages,
mmdet models/backbones/resnet.py Bottleneck.with_dcn).

TPU design: the CUDA kernel's im2col-with-offsets becomes
  offsets = zero-init conv(x)                      # (B, H, W, 2*K)
  samples = bilinear gather at (base grid + kernel offset + offset)
  out     = samples (B, H, W, K*C) . W (K*C, Cout)  # one MXU matmul
which is exactly the RepPoints/VFNet deform-sampling pattern promoted to a
reusable module. DCNv2's modulation is a sigmoid mask multiplying each
sampled tap. Zero-init offsets (and zero-init modulation logits -> 0.5,
rescaled by 2) make the layer equal a plain dense conv at init.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .grid_sample import point_sample_pixel

__all__ = ["DeformConv2d"]


class DeformConv2d(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    modulated: bool = False            # DCNv2
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        k = self.kernel_size
        kk = k * k
        s = self.stride
        off_ch = 3 * kk if self.modulated else 2 * kk
        offsets = nn.Conv(off_ch, (k, k), strides=(s, s),
                          padding=self.dilation * (k // 2),
                          kernel_dilation=(self.dilation, self.dilation),
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          dtype=self.dtype, name="offset_conv")(x)
        oh, ow = offsets.shape[1:3]
        oyx = offsets[..., :2 * kk].reshape(b, oh, ow, kk, 2)
        # base sampling grid: output cell centers (input coords) + the
        # dilated kernel taps
        gy = jnp.arange(oh, dtype=x.dtype)[None, :, None, None] * s
        gx = jnp.arange(ow, dtype=x.dtype)[None, None, :, None] * s
        dk = (jnp.arange(k, dtype=x.dtype) - (k - 1) / 2) * self.dilation
        tap_y = jnp.repeat(dk, k)[None, None, None, :]
        tap_x = jnp.tile(dk, k)[None, None, None, :]
        sy = gy + tap_y + oyx[..., 0]
        sx = gx + tap_x + oyx[..., 1]
        pts = jnp.stack([sx, sy], -1).reshape(b, oh * ow * kk, 2)
        taps = point_sample_pixel(x, pts, padding_mode="zeros")
        taps = taps.reshape(b, oh, ow, kk, c)
        if self.modulated:
            # DCNv2: sigmoid mask per tap, x2 so init (sigmoid(0)=0.5)
            # preserves the plain-conv magnitude
            m = jax.nn.sigmoid(offsets[..., 2 * kk:]) * 2.0
            taps = taps * m[..., None]
        taps = taps.reshape(b, oh, ow, kk * c)
        return nn.Dense(self.out_channels, use_bias=self.use_bias,
                        kernel_init=nn.initializers.he_normal(),
                        dtype=self.dtype, name="weight")(taps)
