"""BFP and ChannelMapper necks.

Parity targets: mmdet models/necks/bfp.py (Libra R-CNN balanced feature
pyramid: resize every level to the middle one, average, refine, add back)
and models/necks/channel_mapper.py (per-level 1x1/3x3 projection used by
DETR-family models).

TPU notes: resizing uses jax.image.resize (nearest for down-compat with
the reference's interpolate+maxpool combo — documented approximation);
everything else is convs XLA fuses as usual.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import NECKS

__all__ = ["BFP", "ChannelMapper"]


def _resize_to(x, hw):
    b, h, w, c = x.shape
    if (h, w) == tuple(hw):
        return x
    return jax.image.resize(x, (b, hw[0], hw[1], c), "nearest")


@NECKS.register_module()
class BFP(nn.Module):
    in_channels: int = 256
    num_levels: int = 5
    refine_level: int = 2
    refine_type: Optional[str] = "conv"   # None | 'conv' (non_local ❌)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == self.num_levels
        mid_hw = feats[self.refine_level].shape[1:3]
        gathered = [_resize_to(f, mid_hw) for f in feats]
        bsf = sum(gathered) / len(gathered)
        if self.refine_type == "conv":
            bsf = nn.Conv(self.in_channels, (3, 3), padding=1,
                          dtype=self.dtype, name="refine")(bsf)
        return tuple(f + _resize_to(bsf, f.shape[1:3]) for f in feats)


@NECKS.register_module()
class ChannelMapper(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    kernel_size: int = 1
    num_outs: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        k = self.kernel_size
        outs = [nn.Conv(self.out_channels, (k, k), padding=k // 2,
                        dtype=self.dtype, name=f"conv{i}")(f)
                for i, f in enumerate(feats)]
        n_extra = (self.num_outs or len(outs)) - len(outs)
        x = feats[-1]
        for i in range(n_extra):
            x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=1, dtype=self.dtype,
                        name=f"extra_conv{i}")(x)
            outs.append(x)
        return tuple(outs)
