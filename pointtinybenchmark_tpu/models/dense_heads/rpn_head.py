"""RPNHead — region proposal network head.

Parity target: mmdet models/dense_heads/rpn_head.py — 3x3 conv + 1x1
cls/reg over AnchorHead machinery; proposals via per-level topk, decode,
min-size filter, level-batched NMS, max_per_img cut. The tiny-object recipe
shrinks anchor scales to [2] (SURVEY.md §2.2).

TPU design: proposal generation is fully on-device with static budgets —
(B, max_per_img, 4) proposals + validity mask, no host sync inside the
train step.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.bbox import delta_coder_fns
from ...ops.nms import batched_nms
from ...utils.registry import HEADS
from .anchor_head import AnchorHead

__all__ = ["RPNHead"]


@HEADS.register_module()
class RPNHead(AnchorHead):
    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        rpn_conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                           kernel_init=nn.initializers.normal(0.01),
                           dtype=self.dtype, name="rpn_conv")
        rpn_cls = nn.Conv(self.num_base_anchors * self.cls_out_channels,
                          (1, 1), dtype=self.dtype, name="rpn_cls",
                          kernel_init=nn.initializers.normal(0.01))
        rpn_reg = nn.Conv(self.num_base_anchors * 4, (1, 1),
                          kernel_init=nn.initializers.normal(0.01),
                          dtype=self.dtype, name="rpn_reg")
        cls_outs, reg_outs = [], []
        for f in feats:
            x = nn.relu(rpn_conv(f))
            cls_outs.append(rpn_cls(x))
            reg_outs.append(rpn_reg(x))
        return cls_outs, reg_outs

    def get_proposals(self, cls_outs, reg_outs, img_shapes, pad_shape,
                      proposal_cfg: dict) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns proposals (B, P, 4), scores (B, P), valid (B, P)."""
        nms_pre = int(proposal_cfg.get("nms_pre", 1000))
        max_per_img = int(proposal_cfg.get("max_per_img", 1000))
        iou_thr = float(proposal_cfg.get("nms", {}).get("iou_threshold", 0.7))
        min_size = float(proposal_cfg.get("min_bbox_size", 0))
        means, stds = self._coder_params()
        _, delta2bbox = delta_coder_fns(self.bbox_coder)

        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        gen = self._build_generator()
        level_anchors = [np.asarray(a).astype(np.float32)
                         for a in gen.grid_anchors(featmap_sizes)]
        b = cls_outs[0].shape[0]
        cls_levels = [c.reshape(b, -1, self.cls_out_channels)
                      for c in cls_outs]
        reg_levels = [r.reshape(b, -1, 4) for r in reg_outs]

        def single(cls_list, reg_list, img_shape):
            boxes_all, scores_all, ids_all = [], [], []
            for lvl in range(len(cls_list)):
                if self.use_sigmoid_cls:
                    sc = jax.nn.sigmoid(cls_list[lvl][:, 0])
                else:
                    sc = jax.nn.softmax(cls_list[lvl], -1)[:, 0]
                k = min(nms_pre, sc.shape[0]) if nms_pre > 0 else sc.shape[0]
                top_sc, idx = jax.lax.top_k(sc, k)
                boxes = delta2bbox(jnp.asarray(level_anchors[lvl])[idx],
                                   reg_list[lvl][idx], means, stds)
                boxes = jnp.stack([
                    jnp.clip(boxes[:, 0], 0, img_shape[1]),
                    jnp.clip(boxes[:, 1], 0, img_shape[0]),
                    jnp.clip(boxes[:, 2], 0, img_shape[1]),
                    jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
                w = boxes[:, 2] - boxes[:, 0]
                h = boxes[:, 3] - boxes[:, 1]
                ok = (w > min_size) & (h > min_size)
                top_sc = jnp.where(ok, top_sc, -1.0)
                boxes_all.append(boxes)
                scores_all.append(top_sc)
                ids_all.append(jnp.full((k,), lvl, jnp.int32))
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            ids = jnp.concatenate(ids_all)
            keep_idx, num = batched_nms(boxes, scores, ids, iou_thr,
                                        max_per_img,
                                        valid_mask=scores > -1.0)
            valid = keep_idx >= 0
            safe = jnp.where(valid, keep_idx, 0)
            return boxes[safe], jnp.where(valid, scores[safe], 0.0), valid

        return jax.vmap(single)(cls_levels, reg_levels, img_shapes)
