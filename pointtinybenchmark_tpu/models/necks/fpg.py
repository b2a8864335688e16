"""FPG — Feature Pyramid Grids (arXiv 2004.03580) and NASFCOS-FPN.

Parity targets:
- mmdet models/necks/fpg.py (FPG): laterals to `inter_channels`, then
  `stack_times` grid stages; each stage fuses, per level, the same-level
  feature (conv trans) + the level above (across_down: stride-2 conv) + the
  level below (across_up: conv + upsample) + an across-lateral conv + an
  optional skip connection from an earlier stage (`skip_inds`); final
  `output_trans` 3x3 to out_channels and extra maxpool levels.
- mmdet models/necks/nasfcos_fpn.py (NASFCOS_FPN): four laterals + the
  NAS-discovered concat-cell graph (f4 = cell(c4, c4') etc.), output via
  per-level 1x1s. The reference's cells use DCN; here cells are
  GN-conv concat cells (deform sampling adds nothing at these shapes —
  documented deviation consistent with the RepPoints/VFNet gather design).

TPU notes: the whole grid is a static unrolled graph of convs/resizes —
XLA fuses the adds; no dynamic control flow.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import NECKS

__all__ = ["FPG", "NASFCOS_FPN"]


def _resize_to(x, hw):
    b, h, w, c = x.shape
    if (h, w) == tuple(hw):
        return x
    return jax.image.resize(x, (b, hw[0], hw[1], c), "nearest")


@NECKS.register_module()
class FPG(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 9
    inter_channels: int = 256
    same_up_trans: Optional[str] = "conv"
    across_lateral_trans: str = "conv"
    across_down_trans: str = "conv"
    across_up_trans: Optional[str] = "conv"
    across_skip_trans: Optional[str] = "identity"
    output_trans: str = "conv"
    skip_inds: Optional[Sequence[Sequence[int]]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        n_in = len(self.in_channels)
        ic = self.inter_channels
        # laterals
        cur = [nn.Conv(ic, (1, 1), dtype=self.dtype,
                       name=f"lateral{i}")(feats[i]) for i in range(n_in)]
        # extra input levels by stride-2 conv (reference pads the pyramid
        # to num_outs before stacking)
        n_lvl = self.num_outs
        for e in range(n_lvl - n_in):
            cur.append(nn.Conv(ic, (3, 3), strides=(2, 2), padding=1,
                               dtype=self.dtype,
                               name=f"extra_in{e}")(cur[-1]))
        history = [list(cur)]
        skip_inds = (list(self.skip_inds) if self.skip_inds is not None
                     else [[] for _ in range(n_lvl)])

        def conv(name, x, stride=1):
            return nn.Conv(ic, (3, 3), strides=(stride, stride), padding=1,
                           dtype=self.dtype, name=name)(x)

        for t in range(self.stack_times):
            nxt = []
            for i in range(n_lvl):
                parts = []
                # same-level transition
                parts.append(conv(f"s{t}_same{i}", cur[i]))
                # across lateral
                if self.across_lateral_trans:
                    parts.append(conv(f"s{t}_lat{i}", cur[i]))
                # from the coarser level (above): upsample into i
                if self.across_up_trans and i + 1 < n_lvl:
                    up = conv(f"s{t}_up{i}", cur[i + 1])
                    parts.append(_resize_to(up, cur[i].shape[1:3]))
                # from the finer level (below): stride down into i
                if self.across_down_trans and i - 1 >= 0:
                    parts.append(conv(f"s{t}_down{i}", cur[i - 1], stride=2))
                # skip connections from earlier stages
                if self.across_skip_trans and i < len(skip_inds):
                    for src in skip_inds[i]:
                        if src < len(history):
                            parts.append(history[src][i])
                nxt.append(nn.relu(sum(parts)))
            cur = nxt
            history.append(list(cur))
        outs = [nn.Conv(self.out_channels, (3, 3), padding=1,
                        dtype=self.dtype, name=f"out{i}")(cur[i])
                for i in range(n_lvl)]
        return tuple(outs)


class _ConcatCell(nn.Module):
    """nasfcos_fpn ConcatCell: concat two inputs (resized to the first's
    resolution), 1x1 reduce with GN + relu."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        b = _resize_to(b, a.shape[1:3])
        x = jnp.concatenate([a, b], -1)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="reduce")(x)
        groups = max(g for g in (32, 16, 8, 4, 2, 1)
                     if self.out_channels % g == 0)
        return nn.relu(nn.GroupNorm(num_groups=groups, epsilon=1e-5)(x))


@NECKS.register_module()
class NASFCOS_FPN(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        feats = feats[-len(self.in_channels):]
        oc = self.out_channels
        lat = [nn.Conv(oc, (1, 1), dtype=self.dtype,
                       name=f"lateral{i}")(f) for i, f in enumerate(feats)]
        c3, c4, c5 = lat[-3], lat[-2], lat[-1]
        # NAS-discovered cell graph (nasfcos_fpn.py forward):
        cell = lambda name: _ConcatCell(oc, dtype=self.dtype, name=name)
        f4_1 = cell("c22_1")(c4, c4)
        f4_2 = cell("c22_2")(f4_1, c4)
        f3 = cell("c32")(c3, f4_2)
        f5 = cell("c02")(c5, f4_2)
        f4 = cell("c42")(f4_2, cell("c36")(f3, f5))
        p3, p4, p5 = f3, f4, f5
        outs = [nn.Conv(oc, (3, 3), padding=1, dtype=self.dtype,
                        name="out3")(p3),
                nn.Conv(oc, (3, 3), padding=1, dtype=self.dtype,
                        name="out4")(p4),
                nn.Conv(oc, (3, 3), padding=1, dtype=self.dtype,
                        name="out5")(p5)]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)
