"""SparseRCNN — end-to-end detection with learnable proposals.

Parity target: mmdet models/detectors/sparse_rcnn.py +
roi_heads/sparse_roi_head.py + bbox_heads/dii_head.py — 100 learnable
proposal boxes/features, 6 iterative DII stages (self-attention over
proposals, dynamic instance interaction over 7x7 RoI features, box delta
refinement), per-stage focal set loss, NMS-free top-k inference.

TPU design: proposal boxes/features are ordinary flax params; RoIAlign is
the shared XLA-gather extractor; the dynamic 1x1 convs are per-proposal
matmuls XLA batches over (B·N). Set matching reuses the in-graph auction
(focal_set_loss).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.bbox import cxcywh2xyxy, delta2bbox
from ...core.post_processing import DetResult
from ...utils.registry import DETECTORS
from ..builder import build_backbone, build_neck
from ..dense_heads.deformable_detr_head import focal_set_loss
from ..roi_heads.roi_extractor import single_roi_extract

__all__ = ["SparseRCNN"]


class DIIStage(nn.Module):
    """Dynamic instance interactive head stage (dii_head.py parity)."""
    embed_dims: int = 256
    num_heads: int = 8
    dyn_channels: int = 64
    ffn_dim: int = 2048
    num_classes: int = 80
    pooler_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats, prop_feats):
        """roi_feats (B, N, S*S, D); prop_feats (B, N, D) ->
        (cls (B,N,C), deltas (B,N,4), new prop_feats)."""
        b, n, ss, d = roi_feats.shape
        dc = self.dyn_channels
        # 1. self-attention over the proposal set
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            name="self_attn")(prop_feats, prop_feats, prop_feats)
        pf = nn.LayerNorm(dtype=self.dtype)(prop_feats + y)
        # 2. dynamic instance interaction: per-proposal 1x1 filters
        params = nn.Dense(2 * dc * d, dtype=self.dtype,
                          name="dynamic_params")(pf)
        p1 = params[..., :dc * d].reshape(b, n, d, dc)
        p2 = params[..., dc * d:].reshape(b, n, dc, d)
        x = jnp.einsum("bnsd,bndc->bnsc", roi_feats, p1)
        x = nn.relu(nn.LayerNorm(dtype=self.dtype)(x))
        x = jnp.einsum("bnsc,bncd->bnsd", x, p2)
        x = nn.relu(nn.LayerNorm(dtype=self.dtype)(x))
        x = x.reshape(b, n, ss * d)
        x = nn.Dense(self.embed_dims, dtype=self.dtype,
                     name="fc_out")(x)
        pf = nn.LayerNorm(dtype=self.dtype)(pf + x)
        # 3. FFN
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(pf)
        y = nn.Dense(self.embed_dims, dtype=self.dtype,
                     name="ffn2")(nn.relu(y))
        pf = nn.LayerNorm(dtype=self.dtype)(pf + y)
        # heads
        c = pf
        for i in range(1):
            c = nn.relu(nn.Dense(self.embed_dims, dtype=self.dtype,
                                 name=f"cls_fc{i}")(c))
        cls = nn.Dense(self.num_classes, dtype=self.dtype,
                       bias_init=nn.initializers.constant(-4.6),
                       name="fc_cls")(c)
        r = pf
        for i in range(3):
            r = nn.relu(nn.Dense(self.embed_dims, dtype=self.dtype,
                                 name=f"reg_fc{i}")(r))
        deltas = nn.Dense(4, dtype=self.dtype,
                          kernel_init=nn.initializers.zeros,
                          name="fc_reg")(r)
        return cls, deltas, pf


@DETECTORS.register_module()
class SparseRCNN(nn.Module):
    backbone: dict
    neck: Optional[dict] = None
    num_proposals: int = 100
    num_stages: int = 6
    embed_dims: int = 256
    num_classes: int = 80
    featmap_strides: Sequence[int] = (4, 8, 16, 32)
    pooler_size: int = 7
    ffn_dim: int = 2048
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone_m = build_backbone(dict(self.backbone))
        self.neck_m = build_neck(dict(self.neck)) if self.neck else None
        self.stages = [DIIStage(embed_dims=self.embed_dims,
                                dyn_channels=64,
                                ffn_dim=self.ffn_dim,
                                num_classes=self.num_classes,
                                pooler_size=self.pooler_size,
                                dtype=self.dtype,
                                name=f"stage{i}")
                       for i in range(self.num_stages)]
        self.init_proposal_boxes = self.param(
            "init_proposal_boxes",
            nn.initializers.constant(jnp.asarray([0.5, 0.5, 1.0, 1.0])),
            (self.num_proposals, 4))
        self.init_proposal_features = self.param(
            "init_proposal_features", nn.initializers.normal(1.0),
            (self.num_proposals, self.embed_dims))

    def extract_feat(self, img, train: bool = False):
        x = self.backbone_m(img, train=train)
        if self.neck_m is not None:
            x = self.neck_m(x)
        return x

    def _run(self, img, train: bool = False):
        feats = self.extract_feat(img, train=train)
        b = img.shape[0]
        h, w = img.shape[1:3]
        init_boxes = self.init_proposal_boxes
        init_feats = self.init_proposal_features
        wh = jnp.asarray([w, h, w, h], jnp.float32)
        boxes = cxcywh2xyxy(jnp.clip(init_boxes, 0.0, 1.0)) * wh
        boxes = jnp.broadcast_to(boxes[None], (b, self.num_proposals, 4))
        pf = jnp.broadcast_to(init_feats[None],
                              (b, self.num_proposals, self.embed_dims)
                              ).astype(self.dtype)

        all_cls, all_boxes = [], []
        for stage in self.stages:
            rois = jnp.concatenate([
                jnp.repeat(jnp.arange(b, dtype=jnp.float32),
                           self.num_proposals)[:, None],
                boxes.reshape(-1, 4)], -1)                  # (B*N, 5)
            rf = single_roi_extract(feats, rois, self.featmap_strides,
                                    self.pooler_size)
            rf = rf.reshape(b, self.num_proposals,
                            self.pooler_size ** 2, -1)
            cls, deltas, pf = stage(rf, pf)
            live = delta2bbox(boxes.reshape(-1, 4),
                              deltas.reshape(-1, 4),
                              means=(0.0, 0.0, 0.0, 0.0),
                              stds=(0.5, 0.5, 1.0, 1.0)
                              ).reshape(b, self.num_proposals, 4)
            all_cls.append(cls)
            all_boxes.append(live)
            # next stage refines detached boxes (reference sparse_roi_head
            # detaches proposals between stages)
            boxes = jax.lax.stop_gradient(live)
        return all_cls, all_boxes

    def __call__(self, img, train: bool = False):
        return self._run(img, train=train)

    def forward_train(self, img, batch: Dict[str, Any]):
        all_cls, all_boxes = self._run(img, train=True)
        pad_shape = (img.shape[1], img.shape[2])
        factor = jnp.asarray([pad_shape[1], pad_shape[0],
                              pad_shape[1], pad_shape[0]], jnp.float32)
        losses: Dict[str, jnp.ndarray] = {}
        num_pos = None
        for si, (cls, bx) in enumerate(zip(all_cls, all_boxes)):
            bn = bx / factor
            cxcywh = jnp.stack([
                (bn[..., 0] + bn[..., 2]) / 2,
                (bn[..., 1] + bn[..., 3]) / 2,
                jnp.clip(bn[..., 2] - bn[..., 0], 1e-6, None),
                jnp.clip(bn[..., 3] - bn[..., 1], 1e-6, None)], -1)
            l = focal_set_loss(cls, cxcywh, batch["gt_bboxes"],
                               batch["gt_labels"], batch["gt_valid"],
                               pad_shape, self.num_classes,
                               loss_cls_weight=2.0, loss_bbox_weight=5.0,
                               loss_iou_weight=2.0, cost_cls_weight=2.0)
            prefix = "" if si == len(all_cls) - 1 else f"s{si}."
            for k, v in l.items():
                if k == "num_pos":
                    num_pos = v
                else:
                    losses[f"loss_{prefix}{k}"] = v
        losses["num_pos"] = num_pos
        return losses

    def simple_test(self, img, img_shapes, scale_factors=None,
                    rescale: bool = False):
        all_cls, all_boxes = self._run(img, train=False)
        cfg = self.test_cfg or {}
        max_per_img = int(cfg.get("max_per_img", 100))
        cls_logits = all_cls[-1]
        boxes = all_boxes[-1]
        b = cls_logits.shape[0]

        def single(logits, bx, img_shape, scale_factor):
            probs = jax.nn.sigmoid(logits)
            flat = probs.reshape(-1)
            k = min(max_per_img, flat.shape[0])
            top_sc, idx = jax.lax.top_k(flat, k)
            qi = idx // self.num_classes
            ci = idx % self.num_classes
            bsel = bx[qi]
            bsel = jnp.stack([
                jnp.clip(bsel[:, 0], 0, img_shape[1]),
                jnp.clip(bsel[:, 1], 0, img_shape[0]),
                jnp.clip(bsel[:, 2], 0, img_shape[1]),
                jnp.clip(bsel[:, 3], 0, img_shape[0])], -1)
            if rescale and scale_factor is not None:
                bsel = bsel / scale_factor
            dets = jnp.concatenate([bsel, top_sc[:, None]], -1)
            valid = top_sc > float(cfg.get("score_thr", 0.0))
            return DetResult(dets, ci.astype(jnp.int32), valid)

        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        return jax.vmap(single)(cls_logits, boxes, img_shapes, sf), None
