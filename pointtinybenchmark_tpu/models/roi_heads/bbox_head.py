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

__all__ = ["Shared2FCBBoxHead", "DoubleConvFCBBoxHead", "SABLHead"]


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


class _BasicResBlock(nn.Module):
    """double_bbox_head.py BasicResBlock: 3x3 + 1x1 with projected identity."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        idn = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      dtype=self.dtype, name="proj")(x)
        y = nn.relu(nn.Conv(x.shape[-1], (3, 3), padding=1, use_bias=False,
                            dtype=self.dtype, name="conv1")(x))
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        return nn.relu(y + idn)


@HEADS.register_module()
class DoubleConvFCBBoxHead(nn.Module):
    """Double-Head R-CNN bbox head (arXiv 1904.06493).

    Parity target: mmdet models/roi_heads/bbox_heads/double_bbox_head.py —
    fc branch (2 FCs) for classification, conv branch (residual blocks +
    GAP + fc) for regression. Drop-in for Shared2FCBBoxHead: returns
    (cls_logits, class-wise deltas)."""
    num_classes: int
    in_channels: int = 256
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    num_convs: int = 4
    num_fcs: int = 2
    roi_feat_size: int = 7
    reg_class_agnostic: bool = True
    bbox_coder: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # conv branch -> regression
        y = _BasicResBlock(self.conv_out_channels, dtype=self.dtype,
                           name="res_block")(roi_feats)
        for i in range(self.num_convs):
            y = _BasicResBlock(self.conv_out_channels, dtype=self.dtype,
                               name=f"conv_branch{i}")(y)
        y = y.mean((1, 2))
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        bbox_pred = nn.Dense(reg_dim, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.001),
                             name="fc_reg")(y)
        # fc branch -> classification
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 name=f"fc_branch{i}")(x))
        cls_score = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name="fc_cls")(x)
        return cls_score, bbox_pred


@HEADS.register_module()
class SABLHead(nn.Module):
    """SABL RoI head (arXiv 1912.04260) — side-aware bucket classification +
    in-bucket residual regression for the second stage.

    Parity target: mmdet models/roi_heads/bbox_heads/sabl_head.py — cls from
    FCs; per-side bucket logits and offsets from row/column-pooled conv
    features. Decoding uses the same BucketingBBoxCoder as SABLRetinaHead
    (core/bbox.py). Returns (cls_logits, (bucket_cls (R, 4*buckets),
    bucket_offsets (R, 4*buckets))) — StandardRoIHead dispatches on the
    tuple reg output.
    """
    num_classes: int
    in_channels: int = 256
    num_buckets: int = 14
    cls_out_channels: int = 1024
    reg_feat_out_channels: int = 256
    reg_out_channels: int = 1024
    roi_feat_size: int = 7
    bbox_coder: Optional[dict] = None
    loss_cls: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        r = roi_feats.shape[0]
        # cls: 2 FCs on the flattened feature
        x = roi_feats.reshape(r, -1)
        for i in range(2):
            x = nn.relu(nn.Dense(self.cls_out_channels, dtype=self.dtype,
                                 name=f"cls_fc{i}")(x))
        cls_score = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name="fc_cls")(x)
        # reg: separate x/y branches from column/row average pooling
        f = nn.relu(nn.Conv(self.reg_feat_out_channels, (3, 3), padding=1,
                            dtype=self.dtype, name="reg_conv")(roi_feats))
        col = f.mean(1)      # (R, W, C) — x-direction
        row = f.mean(2)      # (R, H, C) — y-direction
        outs = []
        for nm, seq in (("x", col), ("y", row)):
            z = nn.relu(nn.Conv(self.reg_out_channels, (3,), padding=1,
                                dtype=self.dtype, name=f"reg_{nm}_conv")(seq))
            z = z.reshape(r, -1)
            z = nn.relu(nn.Dense(self.reg_out_channels, dtype=self.dtype,
                                 name=f"reg_{nm}_fc")(z))
            side = (self.num_buckets + 1) // 2
            bucket_cls = nn.Dense(2 * side, dtype=self.dtype,
                                  name=f"bucket_cls_{nm}")(z)
            bucket_off = nn.Dense(2 * side, dtype=self.dtype,
                                  kernel_init=nn.initializers.normal(0.001),
                                  name=f"bucket_off_{nm}")(z)
            outs.append((bucket_cls, bucket_off))
        (cx, ox), (cy, oy) = outs
        side = (self.num_buckets + 1) // 2
        # reorder to bbox2bucket's side layout [l, r, t, d] x side
        bucket_cls = jnp.concatenate(
            [cx[:, :side], cx[:, side:], cy[:, :side], cy[:, side:]], -1)
        bucket_off = jnp.concatenate(
            [ox[:, :side], ox[:, side:], oy[:, :side], oy[:, side:]], -1)
        return cls_score, (bucket_cls, bucket_off)
