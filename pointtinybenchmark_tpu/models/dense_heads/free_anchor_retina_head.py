"""FreeAnchor RetinaNet head (arXiv 1909.02466).

Parity target: mmdet models/dense_heads/free_anchor_retina_head.py — learning
to match: per-gt bags of the top-k anchors by IoU, positive loss
-log(mean-max(P_cls * P_loc)) over each bag, negative loss a focal term on
P(anchor not matched to any object).

TPU redesign: the reference loops images on host and builds sparse COO
tensors to compute the per-anchor-per-class matched probability. Here the
whole batch is one vmapped pass over padded gt sets, and the sparse max
becomes a scatter-max `zeros(N, C).at[:, labels].max(obp.T)` — dense along
anchors, scattered along classes, no (G, N, C) intermediate.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ...core.bbox import bbox2delta, delta2bbox
from ...ops.iou import bbox_overlaps
from ...utils.registry import HEADS, LOSSES
from .retina_head import RetinaHead

__all__ = ["FreeAnchorRetinaHead"]

EPS = 1e-12


@HEADS.register_module()
class FreeAnchorRetinaHead(RetinaHead):
    pre_anchor_topk: int = 50
    bbox_thr: float = 0.6
    gamma: float = 2.0
    alpha: float = 0.5

    def loss(self, cls_outs, bbox_outs, batch: Dict[str, Any],
             rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        anchors_np, _ = self.flat_anchors(featmap_sizes, batch["pad_shape"])
        anchors = jnp.asarray(anchors_np)
        cls_cat, box_cat = self._flatten_preds(cls_outs, bbox_outs)
        b, n = cls_cat.shape[:2]
        g = batch["gt_bboxes"].shape[1]
        k = min(self.pre_anchor_topk, n)
        means, stds = self._coder_params()
        cls_prob = jax.nn.sigmoid(cls_cat)
        num_classes = self.cls_out_channels
        loss_bbox_fn = LOSSES.build(dict(self.loss_bbox or dict(
            type="SmoothL1Loss", beta=0.11, loss_weight=0.75)))

        def single(gt, labels, valid, cls_p, box_p):
            # ---- P{a_j in A+}: per-anchor-per-class matched probability
            pred_boxes = jax.lax.stop_gradient(
                delta2bbox(anchors, box_p, means, stds))
            obj_iou = bbox_overlaps(gt, pred_boxes)              # (G, N)
            obj_iou = jnp.where(valid[:, None], obj_iou, 0.0)
            t1 = self.bbox_thr
            t2 = jnp.maximum(obj_iou.max(1, keepdims=True), t1 + EPS)
            obp = jnp.clip((obj_iou - t1) / (t2 - t1), 0.0, 1.0)  # (G, N)
            obp = jnp.where(valid[:, None], obp, 0.0)
            image_box_prob = jnp.zeros((n, num_classes), obp.dtype)
            image_box_prob = image_box_prob.at[:, labels].max(obp.T)

            # ---- bags: top-k anchors per gt by anchor IoU
            mq = bbox_overlaps(gt, anchors)                      # (G, N)
            _, matched = jax.lax.top_k(mq, k)                    # (G, K)
            m_cls = cls_p[matched, labels[:, None]]              # (G, K)
            m_anchors = anchors[matched]                         # (G, K, 4)
            m_targets = bbox2delta(m_anchors,
                                   jnp.broadcast_to(gt[:, None, :],
                                                    m_anchors.shape),
                                   means, stds)
            lb = loss_bbox_fn(box_p[matched], m_targets,
                              reduction_override="none").sum(-1)
            m_box = jnp.exp(-lb)                                 # (G, K)

            # positive bag loss: -alpha * log(mean-max(P))
            m_prob = m_cls * m_box
            w = 1.0 / jnp.clip(1.0 - m_prob, EPS, None)
            w = w / w.sum(1, keepdims=True)
            bag_prob = jnp.clip((w * m_prob).sum(1), EPS, 1.0)
            pos_loss = -self.alpha * jnp.log(bag_prob)           # (G,)
            pos_loss = jnp.where(valid, pos_loss, 0.0)
            return pos_loss, image_box_prob

        pos_losses, box_prob = jax.vmap(single)(
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"],
            cls_prob, box_cat)
        num_pos = batch["gt_valid"].sum().astype(jnp.float32)

        positive_loss = pos_losses.sum() / jnp.maximum(num_pos, 1.0)
        # negative: FL(P_cls * (1 - P{a in A+}))
        prob = jnp.clip(cls_prob * (1 - box_prob), EPS, 1 - EPS)
        neg = (1 - self.alpha) * prob ** self.gamma * (-jnp.log(1 - prob))
        negative_loss = neg.sum() / jnp.maximum(num_pos * k, 1.0)
        # reference names these positive_bag_loss/negative_bag_loss; mmdet's
        # _parse_losses sums any key *containing* 'loss', ours sums keys
        # *starting* with it, hence the loss_ prefix.
        return {"loss_positive_bag": positive_loss,
                "loss_negative_bag": negative_loss,
                "num_pos": jnp.maximum(num_pos, 1.0)}
