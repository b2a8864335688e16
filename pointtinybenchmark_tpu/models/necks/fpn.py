"""Feature Pyramid Network (flax.linen, NHWC).

Parity target: mmdet models/necks/fpn.py:218 — lateral 1x1 convs + top-down
nearest-neighbour upsample + 3x3 output convs, `start_level` (the tiny-object
"Adap" recipe sets start_level=0 to keep the stride-4 level, SURVEY.md §2.2),
`num_outs` > inputs via extra levels (max-pool, or convs on input/output).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import NECKS

__all__ = ["FPN"]


def _upsample_nearest(x: jnp.ndarray, shape) -> jnp.ndarray:
    """Nearest-neighbour resize to (H, W) = shape (torch interpolate parity
    for integer scale factors)."""
    return jax.image.resize(x, (x.shape[0], shape[0], shape[1], x.shape[3]),
                            method="nearest")


@NECKS.register_module()
class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: Union[bool, str] = False  # False|'on_input'|'on_lateral'|'on_output'
    relu_before_extra_convs: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        end = len(self.in_channels) if self.end_level == -1 else self.end_level + 1
        used = list(inputs[self.start_level:end])
        n_used = len(used)

        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_conv{i}")(used[i])
            for i in range(n_used)
        ]
        # top-down pathway
        for i in range(n_used - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest(
                laterals[i], laterals[i - 1].shape[1:3])

        # Fork delta (reference fpn.py:134,193): when num_outs < used levels,
        # the full top-down pathway still runs but only the first num_outs
        # levels get output convs (P2P uses num_outs=1 on the stride-4 level).
        n_out_convs = min(n_used, self.num_outs)
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"fpn_conv{i}")(laterals[i])
            for i in range(n_out_convs)
        ]

        # extra levels
        extra = self.add_extra_convs
        if self.num_outs > n_used:
            if not extra:  # max-pool extras (RPN-style)
                for _ in range(self.num_outs - n_used):
                    outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
            else:
                if extra == "on_input" or extra is True:
                    x = inputs[end - 1]
                elif extra == "on_lateral":
                    x = laterals[-1]
                else:  # on_output
                    x = outs[-1]
                for k in range(self.num_outs - n_used):
                    if k > 0 and self.relu_before_extra_convs:
                        x = nn.relu(x)
                    x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                                padding=1, dtype=self.dtype,
                                name=f"extra_conv{k}")(x)
                    outs.append(x)
        return tuple(outs)
