"""TridentResNet backbone.

Parity target: mmdet models/backbones/trident_resnet.py — the final ResNet
stage becomes three parallel branches with SHARED weights but different
3x3 dilations (1, 2, 3); at test time a single branch (test_branch_idx)
runs, at train time all branches produce outputs.

TPU design: weight sharing falls out of flax naturally — one kernel param
applied through `lax.conv_general_dilated` with three rhs_dilations; the
three branches batch into one conv each (XLA treats them as independent
fused convs over the same weights).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES
from .resnet import ARCH_SETTINGS, Bottleneck, ResNet

__all__ = ["TridentResNet"]


class TridentBottleneck(nn.Module):
    """Bottleneck whose 3x3 conv runs per-branch with shared weights."""
    planes: int
    branch_dilations: Sequence[int] = (1, 2, 3)
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    norm_use_running_average: bool = True

    @nn.compact
    def __call__(self, branches):
        """branches: list of (B, H, W, C) — one per dilation."""
        ra = self.norm_use_running_average
        conv1 = nn.Conv(self.planes, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv1")
        kernel3 = self.param(
            "conv2_kernel", nn.initializers.he_normal(),
            (3, 3, self.planes, self.planes))
        conv3 = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv3")
        down = (nn.Conv(self.planes * 4, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False,
                        dtype=self.dtype, name="downsample")
                if self.downsample else None)
        bns = [nn.BatchNorm(use_running_average=ra, dtype=self.dtype,
                            name=f"bn{i}") for i in range(3)]
        bn_down = (nn.BatchNorm(use_running_average=ra, dtype=self.dtype,
                                name="bn_down") if self.downsample else None)

        outs = []
        for bi, x in enumerate(branches):
            d = self.branch_dilations[bi]
            identity = x
            y = nn.relu(bns[0](conv1(x)))
            y = jax.lax.conv_general_dilated(
                y.astype(self.dtype), kernel3.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=((d, d), (d, d)), rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = nn.relu(bns[1](y))
            y = bns[2](conv3(y))
            if down is not None:
                identity = bn_down(down(x))
            outs.append(nn.relu(y + identity))
        return outs


@BACKBONES.register_module()
class TridentResNet(ResNet):
    """ResNet-50/101 with a trident final stage (num_branch=3)."""
    num_branch: int = 3
    test_branch_idx: int = 1
    branch_dilations: Sequence[int] = (1, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, stage_blocks = ARCH_SETTINGS[self.depth]
        use_ra = (not train) or self.norm_eval

        x = nn.Conv(self.base_channels, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=use_ra, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = self.base_channels
        in_ch = self.base_channels
        for i in range(self.num_stages):
            last_stage = i == self.num_stages - 1
            for j in range(stage_blocks[i]):
                s = self.strides[i] if j == 0 else 1
                need_down = (j == 0) and (s != 1 or in_ch != planes * 4)
                if last_stage:
                    if j == 0:
                        branches = [x] * self.num_branch
                    branches = TridentBottleneck(
                        planes=planes,
                        branch_dilations=self.branch_dilations,
                        stride=s, downsample=need_down, dtype=self.dtype,
                        norm_use_running_average=use_ra,
                        name=f"layer{i + 1}_block{j}")(branches)
                else:
                    x = Bottleneck(planes=planes, stride=s,
                                   downsample=need_down, dtype=self.dtype,
                                   norm_use_running_average=use_ra,
                                   name=f"layer{i + 1}_block{j}")(x)
                in_ch = planes * 4
            if i in self.out_indices:
                if last_stage:
                    # train: every branch is an output (trident samples);
                    # test: the single middle branch (test_branch_idx)
                    if train:
                        outs.extend(branches)
                    else:
                        outs.append(branches[self.test_branch_idx])
                else:
                    outs.append(x)
            planes *= 2
        return tuple(outs)
