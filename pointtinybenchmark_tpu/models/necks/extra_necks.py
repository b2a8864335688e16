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

__all__ = ["BFP", "ChannelMapper", "NASFPN", "MergeCell"]


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


def _fit(x, hw):
    """Resize to hw: nearest up, max-pool down (mmcv BaseMergeCell)."""
    h, w = x.shape[1:3]
    th, tw = hw
    if (h, w) == (th, tw):
        return x
    if th >= h:
        return _resize_to(x, hw)
    k = h // th
    return nn.max_pool(x, (k, k), strides=(k, k))


class MergeCell(nn.Module):
    """mmcv ops/merge_cells.py SumCell / GlobalPoolingCell."""
    op: str = "sum"                 # 'sum' | 'gp'
    with_out_conv: bool = True
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, out_size):
        x1 = _fit(x1, out_size)
        x2 = _fit(x2, out_size)
        if self.op == "gp":
            att = jax.nn.sigmoid(x2.mean((1, 2), keepdims=True))
            y = x2 + att * x1
        else:
            y = x1 + x2
        if self.with_out_conv:
            # mmcv order ('act', 'conv', 'norm')
            y = nn.Conv(self.out_channels, (3, 3), padding=1,
                        dtype=self.dtype, name="out_conv")(nn.relu(y))
        return y


@NECKS.register_module()
class NASFPN(nn.Module):
    """mmdet models/necks/nas_fpn.py parity: the discovered 7-cell merging
    topology stacked `stack_times` over P3..P7."""
    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 7
    start_level: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        feats = list(feats)[self.start_level:]
        outs = [nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name=f"lateral{i}")(f) for i, f in enumerate(feats)]
        for i in range(self.num_outs - len(outs)):
            y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name=f"extra{i}")(outs[-1])
            outs.append(nn.max_pool(y, (2, 2), strides=(2, 2)))
        p3, p4, p5, p6, p7 = outs
        oc = self.out_channels
        for si in range(self.stack_times):
            cell = lambda op, wc, nm: MergeCell(op=op, with_out_conv=wc,
                                                out_channels=oc,
                                                dtype=self.dtype,
                                                name=f"s{si}_{nm}")
            p4_1 = cell("gp", True, "gp_64_4")(p6, p4, p4.shape[1:3])
            p4_2 = cell("sum", True, "sum_44_4")(p4_1, p4, p4.shape[1:3])
            p3 = cell("sum", True, "sum_43_3")(p4_2, p3, p3.shape[1:3])
            p4 = cell("sum", True, "sum_34_4")(p3, p4_2, p4.shape[1:3])
            p5_tmp = cell("gp", False, "gp_43_5")(p4, p3, p5.shape[1:3])
            p5 = cell("sum", True, "sum_55_5")(p5, p5_tmp, p5.shape[1:3])
            p7_tmp = cell("gp", False, "gp_54_7")(p5, p4_2, p7.shape[1:3])
            p7 = cell("sum", True, "sum_77_7")(p7, p7_tmp, p7.shape[1:3])
            p6 = cell("gp", True, "gp_75_6")(p7, p5, p6.shape[1:3])
        return p3, p4, p5, p6, p7
