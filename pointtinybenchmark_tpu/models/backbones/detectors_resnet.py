"""DetectoRS backbone — ResNet with SAC + RFP feedback (arXiv 2006.02334).

Parity targets:
- mmdet models/backbones/detectors_resnet.py:211 (DetectoRS_ResNet):
  per-stage switchable atrous conv (`stage_with_sac`), `rfp_inplanes`
  feedback 1x1 (zero-init) added to the first block of stages 1..3,
  `output_img` (prepend the raw image for the RFP neck).
- mmcv ops/saconv.py (SAConv2d): AWS-standardized shared weight run at
  dilation 1 and 3, blended by a switch conv (weight 0 / bias 1 init, so the
  block starts as a plain conv), with global pre/post context (zero-init).

TPU notes: both atrous branches are dense convs sharing one weight — XLA
compiles them as two MXU convs + fused blend; no sparse/deform custom op.
The reference's optional `use_deform=True` refines SAC with DCN offsets —
omitted (documented deviation; the SAC switch itself is the core mechanism).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES

__all__ = ["SAConv2d", "DetectoRS_ResNet"]


class SAConv2d(nn.Module):
    """Switchable Atrous Convolution (mmcv ops/saconv.py)."""
    in_channels: int
    out_channels: int
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s = 3, self.stride
        w = self.param("weight", nn.initializers.he_normal(),
                       (k, k, self.in_channels // self.groups,
                        self.out_channels))
        w = w.astype(self.dtype)
        # AWS: standardize over (k, k, in) per output channel. gamma inits to
        # the he-init std so the standardized weight keeps a calibrated scale
        # (mmcv's ConvAWS2d calibrates gamma from the pretrained checkpoint;
        # unit-variance weights would blow activations up ~sqrt(k*k*Cin)x per
        # layer when training from scratch).
        mean = w.mean((0, 1, 2), keepdims=True)
        std = w.std((0, 1, 2), keepdims=True) + 1e-5
        he_std = float(np.sqrt(2.0 / (k * k * self.in_channels
                               // self.groups)))
        gamma = self.param("weight_gamma",
                           nn.initializers.constant(he_std),
                           (1, 1, 1, self.out_channels)).astype(self.dtype)
        beta = self.param("weight_beta", nn.initializers.zeros,
                          (1, 1, 1, self.out_channels)).astype(self.dtype)
        w = gamma * (w - mean) / std + beta
        wd = self.param("weight_diff", nn.initializers.zeros,
                        (k, k, self.in_channels // self.groups,
                         self.out_channels)).astype(self.dtype)

        # global pre-context (zero-init 1x1 on GAP)
        gap = x.mean((1, 2), keepdims=True)
        x = x + nn.Conv(self.in_channels, (1, 1), dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        name="pre_context")(gap)
        # switch from a 5x5 average pool (reflect-padded)
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
        avg = nn.avg_pool(xp, (5, 5), strides=(s, s))
        switch = nn.Conv(1, (1, 1), dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.ones, name="switch")(avg)

        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        out_s = jax.lax.conv_general_dilated(
            x, w, (s, s), [(1, 1), (1, 1)], rhs_dilation=(1, 1),
            dimension_numbers=dn, feature_group_count=self.groups)
        out_l = jax.lax.conv_general_dilated(
            x, w + wd, (s, s), [(3, 3), (3, 3)], rhs_dilation=(3, 3),
            dimension_numbers=dn, feature_group_count=self.groups)
        out = switch * out_s + (1 - switch) * out_l
        # global post-context
        gap2 = out.mean((1, 2), keepdims=True)
        out = out + nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            kernel_init=nn.initializers.zeros,
                            name="post_context")(gap2)
        return out


class _SACBottleneck(nn.Module):
    """Bottleneck whose 3x3 is optionally SAC, with optional RFP feedback
    (detectors_resnet.py Bottleneck :15-118)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    with_sac: bool = False
    rfp_inplanes: Optional[int] = None
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32
    norm_use_running_average: bool = True

    @nn.compact
    def __call__(self, x, rfp_feat=None):
        bn = lambda name: nn.BatchNorm(
            use_running_average=self.norm_use_running_average,
            dtype=self.dtype, name=name)
        # ResNeXt width (mmdet backbones/resnext.py Bottleneck): grouped
        # 3x3 at width = planes * base_width/64 * groups
        width = ((self.planes * self.base_width // 64) * self.groups
                 if self.groups != 1 else self.planes)
        identity = x
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        if self.with_sac:
            y = SAConv2d(width, width, stride=self.stride,
                         groups=self.groups, dtype=self.dtype,
                         name="conv2_sac")(y)
        else:
            y = nn.Conv(width, (3, 3),
                        strides=(self.stride, self.stride), padding=1,
                        feature_group_count=self.groups,
                        use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        out = y + identity
        if self.rfp_inplanes is not None and rfp_feat is not None:
            # zero-init 1x1 on the fed-back pyramid feature
            out = out + nn.Conv(self.planes * 4, (1, 1), dtype=self.dtype,
                                kernel_init=nn.initializers.zeros,
                                bias_init=nn.initializers.zeros,
                                name="rfp_conv")(rfp_feat)
        return nn.relu(out)


ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


@BACKBONES.register_module()
class DetectoRS_ResNet(nn.Module):
    depth: int = 50
    num_stages: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    strides: Sequence[int] = (1, 2, 2, 2)
    frozen_stages: int = -1
    norm_eval: bool = True
    base_channels: int = 64
    sac: Optional[dict] = None
    stage_with_sac: Sequence[bool] = (False, False, False, False)
    rfp_inplanes: Optional[int] = None
    output_img: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, rfp_feats=None):
        img = x
        use_ra = (not train) or self.norm_eval
        stage_blocks = ARCH[self.depth]
        x = nn.Conv(self.base_channels, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=use_ra, dtype=self.dtype,
                         name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = self.base_channels
        in_ch = self.base_channels
        for i in range(self.num_stages):
            with_sac = bool(self.sac) and bool(self.stage_with_sac[i])
            stage_rfp = (self.rfp_inplanes if (i > 0 and rfp_feats is not None)
                         else None)
            for j in range(stage_blocks[i]):
                s = self.strides[i] if j == 0 else 1
                need_down = (j == 0) and (s != 1 or in_ch != planes * 4)
                blk = _SACBottleneck(
                    planes=planes, stride=s, downsample=need_down,
                    with_sac=with_sac,
                    rfp_inplanes=stage_rfp if j == 0 else None,
                    groups=self.groups, base_width=self.base_width,
                    dtype=self.dtype, norm_use_running_average=use_ra,
                    name=f"layer{i + 1}_block{j}")
                rf = (rfp_feats[i] if (j == 0 and stage_rfp is not None)
                      else None)
                x = blk(x, rfp_feat=rf)
                in_ch = planes * 4
            if i in self.out_indices:
                outs.append(x)
            planes *= 2
        if self.output_img:
            return tuple([img] + outs)
        return tuple(outs)


@BACKBONES.register_module()
class DetectoRS_ResNeXt(DetectoRS_ResNet):
    """DetectoRS over ResNeXt bottlenecks (mmdet backbones/
    detectors_resnext.py:98): grouped 3x3/SAC convs at ResNeXt width."""
    groups: int = 1
    base_width: int = 4
