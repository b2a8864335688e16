"""RetinaHead — RetinaNet dense head.

Parity target: mmdet models/dense_heads/retina_head.py — 4 stacked convs on
each of the cls/reg branches over the AnchorHead machinery. The tiny-object
"Adap" recipe plugs in via the anchor_generator config
(octave_base_scale=2, strides starting at 4 — SURVEY.md §2.2).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import HEADS
from ..utils import ConvModule, bias_init_with_prob
from .anchor_head import AnchorHead

__all__ = ["RetinaHead"]


@HEADS.register_module()
class RetinaHead(AnchorHead):
    stacked_convs: int = 4
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        norm = (self.norm_cfg or {}).get("type") if self.norm_cfg else None
        ngroups = (self.norm_cfg or {}).get("num_groups", 32)
        cls_convs = [ConvModule(self.feat_channels, 3, norm=norm,
                                num_groups=ngroups, dtype=self.dtype,
                                name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [ConvModule(self.feat_channels, 3, norm=norm,
                                num_groups=ngroups, dtype=self.dtype,
                                name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        retina_cls = nn.Conv(self.num_base_anchors * self.cls_out_channels,
                             (3, 3), padding=1, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             bias_init=nn.initializers.constant(
                                 bias_init_with_prob(0.01)),
                             name="retina_cls")
        retina_reg = nn.Conv(self.num_base_anchors * 4, (3, 3), padding=1,
                             kernel_init=nn.initializers.normal(0.01),
                             dtype=self.dtype, name="retina_reg")
        cls_outs, reg_outs = [], []
        for f in feats:
            cf, rf = f, f
            for conv in cls_convs:
                cf = conv(cf, train=train)
            for conv in reg_convs:
                rf = conv(rf, train=train)
            cls_outs.append(retina_cls(cf))
            reg_outs.append(retina_reg(rf))
        return cls_outs, reg_outs
