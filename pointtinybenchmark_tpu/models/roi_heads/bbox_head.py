"""RoI bbox heads.

Parity target: mmdet models/roi_heads/bbox_heads/convfc_bbox_head.py
(Shared2FCBBoxHead: flatten RoI features -> 2 shared FCs -> cls (C+1 softmax)
+ reg (4*C class-wise deltas)).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import HEADS

__all__ = ["Shared2FCBBoxHead"]


@HEADS.register_module()
class Shared2FCBBoxHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    fc_out_channels: int = 1024
    roi_feat_size: int = 7
    num_shared_fcs: int = 2
    reg_class_agnostic: bool = False
    bbox_coder: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    dtype: Any = jnp.float32

    @property
    def reg_dim(self) -> int:
        return 4 if self.reg_class_agnostic else 4 * self.num_classes

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """roi_feats: (R, roi, roi, C) -> (cls_logits (R, C+1), deltas (R, reg_dim))."""
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        for i in range(self.num_shared_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 name=f"shared_fc{i}")(x))
        cls_score = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name="fc_cls")(x)
        bbox_pred = nn.Dense(self.reg_dim, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.001),
                             name="fc_reg")(x)
        return cls_score, bbox_pred
