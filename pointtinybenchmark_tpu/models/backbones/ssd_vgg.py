"""SSD-VGG backbone.

Parity target: mmdet models/backbones/ssd_vgg.py — VGG-16 feature
extractor with ceil-mode pooling, fc6/fc7 reparameterized as dilated
convs, L2Norm-scaled conv4_3 output, and the SSD extra-layer pyramid
(300: 38/19/10/5/3/1 grids).

TPU notes: ceil-mode pooling is emulated by edge padding when the spatial
size is odd; L2Norm is a per-channel learned scale over the normalized
feature (init 20.0 like the reference).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES

__all__ = ["SSDVGG", "L2Norm"]

VGG16_CFG = [2, 2, 3, 3, 3]  # convs per stage


class L2Norm(nn.Module):
    scale: float = 20.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.param("weight", nn.initializers.constant(self.scale),
                       (x.shape[-1],))
        n = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, -1,
                             keepdims=True)) + 1e-10
        return (x / n * g).astype(x.dtype)


def _ceil_pool(x, k=2, s=2):
    h, w = x.shape[1:3]
    ph = (s - h % s) % s
    pw = (s - w % s) % s
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return nn.max_pool(x, (k, k), strides=(s, s))


@BACKBONES.register_module()
class SSDVGG(nn.Module):
    input_size: int = 300
    depth: int = 16
    base_channels: int = 64      # slimmer test networks scale from here
    out_feature_indices: Sequence[int] = (22, 34)  # config-parity, unused
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        c = self.base_channels
        outs = []
        # VGG stages
        for si, n_convs in enumerate(VGG16_CFG):
            ch = min(c * (2 ** si), c * 8)
            for j in range(n_convs):
                x = nn.relu(nn.Conv(ch, (3, 3), padding=1,
                                    dtype=self.dtype,
                                    name=f"conv{si + 1}_{j + 1}")(x))
            if si == 3:          # conv4_3: L2Norm'd first output
                outs.append(L2Norm(dtype=self.dtype, name="l2norm")(x))
            if si < 4:
                x = _ceil_pool(x)
            else:                # pool5: 3x3 stride 1 (SSD mod)
                x = nn.max_pool(x, (3, 3), strides=(1, 1),
                                padding=((1, 1), (1, 1)))
        # fc6 (dilated) + fc7
        x = nn.relu(nn.Conv(c * 16, (3, 3), padding=6,
                            kernel_dilation=(6, 6), dtype=self.dtype,
                            name="fc6")(x))
        x = nn.relu(nn.Conv(c * 16, (1, 1), dtype=self.dtype,
                            name="fc7")(x))
        outs.append(x)
        # extra layers: alternating 1x1 reduce / 3x3 stride-2 (then valid)
        extra = [(c * 4, c * 8, 2, 1), (c * 2, c * 4, 2, 1),
                 (c * 2, c * 4, 1, 0), (c * 2, c * 4, 1, 0)]
        if self.input_size == 512:
            extra.append((c * 2, c * 4, 1, 0))
        for i, (red, out_ch, s, p) in enumerate(extra):
            x = nn.relu(nn.Conv(red, (1, 1), dtype=self.dtype,
                                name=f"extra{i}_1")(x))
            x = nn.relu(nn.Conv(out_ch, (3, 3), strides=(s, s),
                                padding=p, dtype=self.dtype,
                                name=f"extra{i}_2")(x))
            outs.append(x)
        return tuple(outs)
