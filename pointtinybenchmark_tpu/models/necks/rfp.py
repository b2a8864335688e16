"""RFP — Recursive Feature Pyramid (DetectoRS, arXiv 2006.02334).

Parity target: mmdet models/necks/rfp.py — FPN run `rfp_steps` times; between
steps, ASPP-transformed pyramid features are fed back into a second copy of
the backbone (`rfp_modules`), and the two pyramids are blended per-pixel by a
zero-init 1x1 fusion weight (sigmoid(0)=0.5 at init).

TPU notes: the recursion is a static Python unroll (rfp_steps is a config
constant), so the whole two-pass backbone+FPN compiles to one XLA program.
The FPN weights are shared across steps (reference `super().forward`); each
step has its own feedback backbone copy.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import NECKS
from .fpn import FPN

__all__ = ["ASPP", "RFP"]


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling (rfp.py:11): three dilated convs on the
    feature + one 1x1 on its global average, concatenated."""
    in_channels: int
    out_channels: int
    dilations: Sequence[int] = (1, 3, 6, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.dilations[-1] == 1
        gap = x.mean((1, 2), keepdims=True)
        outs = []
        for i, d in enumerate(self.dilations):
            k = 3 if d > 1 else 1
            pad = d if d > 1 else 0
            inp = gap if i == len(self.dilations) - 1 else x
            y = nn.Conv(self.out_channels, (k, k), padding=pad,
                        kernel_dilation=(d, d), dtype=self.dtype,
                        name=f"aspp{i}")(inp)
            outs.append(nn.relu(y))
        outs[-1] = jnp.broadcast_to(outs[-1], outs[-2].shape)
        return jnp.concatenate(outs, -1)


@NECKS.register_module()
class RFP(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: Any = False
    rfp_steps: int = 2
    rfp_backbone: Optional[dict] = None
    aspp_out_channels: int = 64
    aspp_dilations: Sequence[int] = (1, 3, 6, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        """inputs = (img, C2, ..., C5) — the backbone ran with
        output_img=True (rfp.py:116-121)."""
        assert len(inputs) == len(self.in_channels) + 1
        img, feats = inputs[0], tuple(inputs[1:])
        fpn = FPN(in_channels=self.in_channels,
                  out_channels=self.out_channels, num_outs=self.num_outs,
                  start_level=self.start_level,
                  add_extra_convs=self.add_extra_convs, dtype=self.dtype,
                  name="fpn")
        x = fpn(feats)
        rfp_weight = nn.Conv(1, (1, 1), dtype=self.dtype,
                             kernel_init=nn.initializers.zeros,
                             bias_init=nn.initializers.zeros,
                             name="rfp_weight")
        aspp = ASPP(self.out_channels, self.aspp_out_channels,
                    self.aspp_dilations, dtype=self.dtype, name="rfp_aspp")
        for step in range(self.rfp_steps - 1):
            rfp_feats = [x[0]] + [aspp(x[i]) for i in range(1, len(x))]
            bb_cfg = dict(self.rfp_backbone or {})
            bb_cfg.pop("type", None)
            bb_cfg.pop("rfp_inplanes", None)
            bb_cfg.pop("output_img", None)
            from ..backbones.detectors_resnet import DetectoRS_ResNet
            bb = DetectoRS_ResNet(
                rfp_inplanes=self.aspp_out_channels
                * len(self.aspp_dilations),
                output_img=False, name=f"rfp_backbone{step}", **bb_cfg)
            # feedback pass through the step's own backbone copy
            feats_i = bb(img, train=train, rfp_feats=rfp_feats)
            x_idx = fpn(feats_i)
            x_new = []
            for ft in range(len(x_idx)):
                add_w = nn.sigmoid(rfp_weight(x_idx[ft]))
                x_new.append(add_w * x_idx[ft] + (1 - add_w) * x[ft])
            x = x_new
        return tuple(x)
