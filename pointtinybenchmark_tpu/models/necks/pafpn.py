"""PAFPN — FPN + bottom-up path aggregation.

Parity target: mmdet models/necks/pafpn.py — after the FPN top-down pass,
a second bottom-up pass with stride-2 downsample convs refines the outputs.
"""
from __future__ import annotations

from typing import Any, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import NECKS
from .fpn import _upsample_nearest

__all__ = ["PAFPN"]


@NECKS.register_module()
class PAFPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: Union[bool, str] = False
    relu_before_extra_convs: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        end = len(self.in_channels) if self.end_level == -1 else self.end_level + 1
        used = list(inputs[self.start_level:end])
        n = len(used)

        laterals = [nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name=f"lateral_conv{i}")(used[i])
                    for i in range(n)]
        for i in range(n - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest(
                laterals[i], laterals[i - 1].shape[1:3])
        inter = [nn.Conv(self.out_channels, (3, 3), padding=1,
                         dtype=self.dtype, name=f"fpn_conv{i}")(laterals[i])
                 for i in range(n)]
        # bottom-up path aggregation
        for i in range(n - 1):
            down = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                           padding=1, dtype=self.dtype,
                           name=f"downsample_conv{i}")(inter[i])
            inter[i + 1] = inter[i + 1] + down
        outs = [inter[0]] + [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"pafpn_conv{i}")(inter[i]) for i in range(1, n)]

        if self.num_outs > n:
            if not self.add_extra_convs:
                for _ in range(self.num_outs - n):
                    outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
            else:
                x = inputs[end - 1] if self.add_extra_convs in (True, "on_input") \
                    else outs[-1]
                for k in range(self.num_outs - n):
                    if k > 0 and self.relu_before_extra_convs:
                        x = nn.relu(x)
                    x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                                padding=1, dtype=self.dtype,
                                name=f"extra_conv{k}")(x)
                    outs.append(x)
        return tuple(outs)
