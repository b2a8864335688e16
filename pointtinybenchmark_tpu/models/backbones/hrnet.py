"""HRNet backbone + HRFPN neck.

Parity targets: mmdet models/backbones/hrnet.py (multi-resolution parallel
branches with repeated cross-resolution fusion; config schema
extra=dict(stage1..stage4)) and mmdet models/necks/hrfpn.py (concat all
branches at 1/4 resolution → 1x1 conv → avg-pool pyramid → 3x3 convs).

TPU notes: branch tensors keep static shapes per level; fusion
upsampling is nearest-neighbour `jax.image.resize` (XLA lowers to a
broadcast-reshape, HBM-bandwidth bound) and downsampling is strided conv.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES, NECKS
from .resnet import BasicBlock, Bottleneck

__all__ = ["HRNet", "HRFPN"]

DEFAULT_EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                num_blocks=(4,), num_channels=(64,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                num_blocks=(4, 4), num_channels=(32, 64)),
    stage3=dict(num_modules=4, num_branches=3, block="BASIC",
                num_blocks=(4, 4, 4), num_channels=(32, 64, 128)),
    stage4=dict(num_modules=3, num_branches=4, block="BASIC",
                num_blocks=(4, 4, 4, 4), num_channels=(32, 64, 128, 256)),
)


def _nearest_up(x, factor: int):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), "nearest")


@BACKBONES.register_module()
class HRNet(nn.Module):
    extra: Optional[dict] = None
    base_channels: int = 64
    norm_eval: bool = True
    frozen_stages: int = -1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        extra = {k: dict(v) for k, v in (self.extra or DEFAULT_EXTRA).items()}
        ra = (not train) or self.norm_eval

        def conv_bn_relu(y, ch, stride=1, k=3, relu=True, name=None):
            y = nn.Conv(ch, (k, k), strides=(stride, stride),
                        padding=k // 2, use_bias=False, dtype=self.dtype,
                        name=None if name is None else f"{name}_conv")(y)
            y = nn.BatchNorm(use_running_average=ra, dtype=self.dtype,
                             name=None if name is None else f"{name}_bn")(y)
            return nn.relu(y) if relu else y

        # stem: two stride-2 3x3 convs -> 1/4 resolution
        x = conv_bn_relu(x, self.base_channels, stride=2, name="stem1")
        x = conv_bn_relu(x, self.base_channels, stride=2, name="stem2")

        # stage 1: bottleneck layer
        s1 = extra["stage1"]
        planes = s1["num_channels"][0]
        for j in range(s1["num_blocks"][0]):
            need_down = (j == 0)
            x = Bottleneck(planes=planes, stride=1, downsample=need_down,
                           dtype=self.dtype, norm_use_running_average=ra,
                           name=f"layer1_block{j}")(x)
        branches = [x]
        prev_channels = [planes * 4]

        for si, key in enumerate(["stage2", "stage3", "stage4"]):
            cfg = extra[key]
            nb = cfg["num_branches"]
            chans = list(cfg["num_channels"])
            block = BasicBlock if cfg["block"] == "BASIC" else Bottleneck
            expansion = 1 if cfg["block"] == "BASIC" else 4
            out_chans = [c * expansion for c in chans]

            # transition: adapt/extend branch list
            new_branches = []
            for bi in range(nb):
                if bi < len(branches):
                    y = branches[bi]
                    if prev_channels[bi] != out_chans[bi]:
                        y = conv_bn_relu(y, out_chans[bi],
                                         name=f"t{si}_b{bi}")
                    new_branches.append(y)
                else:
                    # new lower-resolution branch from the lowest existing
                    y = conv_bn_relu(branches[-1], out_chans[bi], stride=2,
                                     name=f"t{si}_b{bi}")
                    new_branches.append(y)
            branches = new_branches

            # modules: per-branch blocks + full fusion
            for m in range(cfg["num_modules"]):
                # branch convs
                for bi in range(nb):
                    y = branches[bi]
                    for j in range(cfg["num_blocks"][bi]):
                        need_down = (j == 0) and block is Bottleneck and \
                            y.shape[-1] != out_chans[bi]
                        y = block(planes=chans[bi], stride=1,
                                  downsample=need_down, dtype=self.dtype,
                                  norm_use_running_average=ra,
                                  name=f"s{si}_m{m}_b{bi}_blk{j}")(y)
                    branches[bi] = y
                # fuse
                fused = []
                for ti in range(nb):
                    acc = branches[ti]
                    for fj in range(nb):
                        if fj == ti:
                            continue
                        y = branches[fj]
                        if fj > ti:     # lower res -> up: 1x1 conv + NN up
                            y = conv_bn_relu(y, out_chans[ti], k=1,
                                             relu=False,
                                             name=f"s{si}_m{m}_f{ti}_{fj}")
                            y = _nearest_up(y, 2 ** (fj - ti))
                        else:           # higher res -> down: strided 3x3s
                            for d in range(ti - fj):
                                last = d == ti - fj - 1
                                y = conv_bn_relu(
                                    y, out_chans[ti] if last
                                    else y.shape[-1],
                                    stride=2, relu=not last,
                                    name=f"s{si}_m{m}_f{ti}_{fj}_d{d}")
                        acc = acc + y
                    fused.append(nn.relu(acc))
                branches = fused
            prev_channels = out_chans

        return tuple(branches)


@NECKS.register_module()
class HRFPN(nn.Module):
    """mmdet models/necks/hrfpn.py parity."""
    in_channels: Sequence[int] = (32, 64, 128, 256)
    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # upsample everything to the 1/4-res branch and concat
        h, w = feats[0].shape[1:3]
        ups = [feats[0]]
        for i, f in enumerate(feats[1:], 1):
            ups.append(_nearest_up(f, 2 ** i))
        x = jnp.concatenate(ups, -1)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="reduction")(x)
        outs = [x]
        for i in range(1, self.num_outs):
            k = 2 ** i
            outs.append(nn.avg_pool(x, (k, k), strides=(k, k)))
        return tuple(
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"fpn_conv{i}")(o)
            for i, o in enumerate(outs))
