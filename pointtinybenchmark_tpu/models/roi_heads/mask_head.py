"""FCNMaskHead — Mask R-CNN's mask branch.

Parity target: mmdet models/roi_heads/mask_heads/fcn_mask_head.py — 4 convs
+ 2x deconv + per-class 1x1; BCE on the assigned class channel; mask targets
by RoIAligning the gt bitmap into the proposal (mmdet mask_target).

TPU design: gt masks ride as (B, G, H, W) uint8 device arrays; target
cropping is the same XLA-gather RoIAlign used for features — no host mask
ops inside the step.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.roi_align import roi_align
from ...utils.registry import HEADS

__all__ = ["FCNMaskHead", "mask_target"]


@HEADS.register_module()
class FCNMaskHead(nn.Module):
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 80
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x (R, s, s, C) -> mask logits (R, 2s, 2s, num_classes)."""
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                                dtype=self.dtype, name=f"conv{i}")(x))
        x = nn.relu(nn.ConvTranspose(self.conv_out_channels, (2, 2),
                                     strides=(2, 2), dtype=self.dtype,
                                     name="upsample")(x))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.001),
                       name="conv_logits")(x)


def mask_target(gt_masks: jnp.ndarray, rois: jnp.ndarray,
                gt_inds: jnp.ndarray, mask_size: int = 28) -> jnp.ndarray:
    """Crop gt bitmaps into proposals.

    gt_masks (B, G, H, W) float/uint8; rois (R, 5) with batch idx;
    gt_inds (R,) index into G. Returns (R, mask_size, mask_size) float.
    """
    b, g, h, w = gt_masks.shape
    # flatten (B, G) -> one image stack indexed by b*G+g
    flat = gt_masks.reshape(b * g, h, w, 1).astype(jnp.float32)
    flat_idx = rois[:, 0].astype(jnp.int32) * g + gt_inds.astype(jnp.int32)
    rois_flat = jnp.concatenate(
        [flat_idx[:, None].astype(rois.dtype), rois[:, 1:5]], axis=1)
    crop = roi_align(flat, rois_flat, 1.0, mask_size, sampling_ratio=2)
    return (crop[..., 0] >= 0.5).astype(jnp.float32)
