"""FPN with CARAFE upsampling in the top-down pathway.

Parity target: mmdet models/necks/fpn_carafe.py (FPN_CARAFE) — lateral 1x1
convs, top-down pathway whose upsampler is configurable ('carafe' | 'nearest'
| 'bilinear' | 'pixel_shuffle' | 'deconv' | None), extra levels built from
stride-2 3x3 convs on the last input and *included* in the top-down pathway
(unlike stock FPN), then 3x3 output convs on every level.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.carafe import CARAFEPack
from ...utils.registry import NECKS

__all__ = ["FPN_CARAFE"]


@NECKS.register_module()
class FPN_CARAFE(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    upsample: str = "carafe"       # 'carafe'|'nearest'|'bilinear'|'pixel_shuffle'|None
    up_kernel: int = 5
    up_group: int = 1
    encoder_kernel: int = 3
    encoder_dilation: int = 1
    compressed_channels: int = 64
    dtype: Any = jnp.float32

    def _up(self, x, name):
        if self.upsample == "carafe":
            return CARAFEPack(channels=self.out_channels, scale_factor=2,
                              up_kernel=self.up_kernel, up_group=self.up_group,
                              encoder_kernel=self.encoder_kernel,
                              encoder_dilation=self.encoder_dilation,
                              compressed_channels=self.compressed_channels,
                              dtype=self.dtype, name=name)(x)
        b, h, w, c = x.shape
        if self.upsample in ("nearest", "bilinear"):
            m = "nearest" if self.upsample == "nearest" else "linear"
            return jax.image.resize(x, (b, 2 * h, 2 * w, c), m)
        if self.upsample == "pixel_shuffle":
            y = nn.Conv(self.out_channels * 4, (self.up_kernel,) * 2,
                        padding=(self.up_kernel - 1) // 2, dtype=self.dtype,
                        name=name)(x)
            y = y.reshape(b, h, w, self.out_channels, 2, 2)
            return y.transpose(0, 1, 4, 2, 5, 3).reshape(b, 2 * h, 2 * w,
                                                         self.out_channels)
        raise ValueError(f"unsupported upsample {self.upsample!r}")

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        end = len(self.in_channels) if self.end_level == -1 else self.end_level + 1
        used = list(inputs[self.start_level:end])
        laterals = [nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name=f"lateral_conv{i}")(f)
                    for i, f in enumerate(used)]
        # extra levels: stride-2 3x3 lateral convs chained from the last
        # input, appended to the pathway (fpn_carafe.py extra_out_levels)
        x = inputs[end - 1]
        for k in range(self.num_outs - len(used)):
            x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name=f"extra_lateral_conv{k}")(x)
            laterals.append(x)
        # top-down over ALL levels (extras included)
        for i in range(len(laterals) - 1, 0, -1):
            up = self._up(laterals[i], name=f"upsample{i - 1}")
            th, tw = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + up[:, :th, :tw, :]
        return tuple(
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"fpn_conv{i}")(lat)
            for i, lat in enumerate(laterals))
