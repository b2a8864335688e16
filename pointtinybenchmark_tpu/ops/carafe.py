"""CARAFE: Content-Aware ReAssembly of FEatures (arXiv 1905.02188).

Parity target: mmcv ops/carafe.py CARAFEPack (consumed by the reference's
FPN_CARAFE neck, mmdet models/necks/fpn_carafe.py:3, and FCN mask head
upsampling, mmdet models/roi_heads/mask_heads/fcn_mask_head.py:8).

TPU design: the CUDA kernel gathers a k_up x k_up neighbourhood around each
output pixel's source location and blends it with a predicted, softmaxed
kernel. Gather-by-neighbourhood is a scatter-free, static-shape op, so we
express it as an unrolled shift-and-accumulate: for each of the k_up^2 kernel
taps, pad-shift the input once, nearest-upsample, and fuse a multiply-add
with the matching mask slice. XLA fuses the whole accumulation into one
elementwise loop over HBM — no materialized (B, sH, sW, k^2, C) tensor.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["carafe", "CARAFEPack"]


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """x[b, i+dy, j+dx, c] with zero padding outside (NHWC)."""
    b, h, w, c = x.shape
    pad = max(abs(dy), abs(dx))
    if pad == 0:
        return x
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    return jax.lax.dynamic_slice(xp, (0, pad + dy, pad + dx, 0), x.shape)


def carafe(x: jnp.ndarray, masks: jnp.ndarray, k_up: int = 5,
           group: int = 1, scale: int = 2) -> jnp.ndarray:
    """Reassemble ``x`` (B, H, W, C) into (B, sH, sW, C).

    ``masks`` is (B, sH, sW, group * k_up**2), already softmax-normalized over
    the k_up**2 taps per group (channel layout g * k_up**2 + kk, matching
    mmcv's kernel_normalizer view(n, group, k^2, h, w)). Output pixel (i, j)
    blends the k_up x k_up neighbourhood of source pixel (i // s, j // s).
    """
    b, h, w, c = x.shape
    assert c % group == 0
    sh, sw = h * scale, w * scale
    assert masks.shape == (b, sh, sw, group * k_up * k_up)
    r = k_up // 2
    out = jnp.zeros((b, sh, sw, c), x.dtype)
    cg = c // group
    for kk in range(k_up * k_up):
        dy, dx = kk // k_up - r, kk % k_up - r
        shifted = _shift2d(x, dy, dx)
        up = jnp.repeat(jnp.repeat(shifted, scale, axis=1), scale, axis=2)
        # mask tap kk of every group, broadcast over the group's channels
        m = masks[..., kk::k_up * k_up]                      # (B,sH,sW,group)
        m = jnp.repeat(m, cg, axis=-1) if group > 1 else m
        out = out + up * m.astype(x.dtype)
    return out


class CARAFEPack(nn.Module):
    """mmcv CARAFEPack: channel compressor -> content encoder -> pixel
    shuffle -> per-group softmax over k_up^2 taps -> carafe reassembly."""
    channels: int = 256
    scale_factor: int = 2
    up_kernel: int = 5
    up_group: int = 1
    encoder_kernel: int = 3
    encoder_dilation: int = 1
    compressed_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s, k, g = self.scale_factor, self.up_kernel, self.up_group
        comp = nn.Conv(self.compressed_channels, (1, 1), dtype=self.dtype,
                       name="channel_compressor")(x)
        ek = self.encoder_kernel
        pad = int((ek - 1) * self.encoder_dilation / 2)
        enc = nn.Conv(s * s * k * k * g, (ek, ek), padding=pad,
                      kernel_dilation=(self.encoder_dilation,) * 2,
                      dtype=self.dtype, name="content_encoder")(comp)
        # pixel shuffle (torch semantics: in-channel = c_out*s^2 + i*s + j)
        b, h, w, _ = enc.shape
        m = enc.reshape(b, h, w, k * k * g, s, s)
        m = m.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * s, w * s, k * k * g)
        # kernel_normalizer: softmax over the k^2 taps within each group;
        # we store layout (g, k^2) flattened as g*k^2 + kk to match carafe()
        m = m.reshape(b, h * s, w * s, g, k * k)
        m = jax.nn.softmax(m, axis=-1).reshape(b, h * s, w * s, g * k * k)
        return carafe(x, m, k_up=k, group=g, scale=s)
