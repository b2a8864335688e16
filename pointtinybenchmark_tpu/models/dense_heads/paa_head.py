"""PAAHead — Probabilistic Anchor Assignment.

Parity target: mmdet models/dense_heads/paa_head.py — candidate anchors
picked per gt per level by current joint (cls + reg) loss, a 2-component
1-D Gaussian mixture fit on each gt's candidate losses separates positives
from negatives, the centerness slot is repurposed as an IoU-prediction
branch trained on the decoded-box IoU.

TPU design: the reference fits sklearn GMMs per gt on host; here the EM
is a fixed-iteration, fully-masked batched update over the (G, N)
candidate-loss matrix — no host round-trip, differentiable-adjacent (all
stop-gradient), identical math. Score voting at test time is not ported
(IoU-fused scores only — documented deviation).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.bbox import delta2bbox
from ...ops.iou import bbox_overlaps_aligned
from ...utils.registry import HEADS, LOSSES
from .atss_head import ATSSHead

__all__ = ["PAAHead"]

_EM_ITERS = 10
_BIG = 1e8


def gmm_split(losses: jnp.ndarray, cand: jnp.ndarray) -> jnp.ndarray:
    """Fit a 2-component 1D GMM per row and return the positive mask.

    losses (G, N): per-gt candidate losses; cand (G, N) candidate mask.
    Returns (G, N) bool — candidates whose posterior favours the low-loss
    component.
    """
    w = cand.astype(jnp.float32)
    cnt = jnp.maximum(w.sum(-1, keepdims=True), 1.0)
    big = jnp.where(cand, losses, _BIG)
    small = jnp.where(cand, losses, -_BIG)
    mu1 = jnp.min(big, -1, keepdims=True)           # low-loss component
    mu2 = jnp.max(small, -1, keepdims=True)         # high-loss component
    mean = (losses * w).sum(-1, keepdims=True) / cnt
    var = ((losses - mean) ** 2 * w).sum(-1, keepdims=True) / cnt
    s1 = s2 = jnp.sqrt(var) + 1e-4
    pi = jnp.full_like(mu1, 0.5)

    def pdf(x, mu, s):
        return jnp.exp(-0.5 * ((x - mu) / s) ** 2) / (s * 2.5066283)

    r = w * 0.5
    for _ in range(_EM_ITERS):
        p1 = pi * pdf(losses, mu1, s1)
        p2 = (1 - pi) * pdf(losses, mu2, s2)
        r = jnp.where(cand, p1 / (p1 + p2 + 1e-12), 0.0)
        n1 = jnp.maximum((r * w).sum(-1, keepdims=True), 1e-6)
        n2 = jnp.maximum(((1 - r) * w).sum(-1, keepdims=True), 1e-6)
        mu1 = (r * w * losses).sum(-1, keepdims=True) / n1
        mu2 = ((1 - r) * w * losses).sum(-1, keepdims=True) / n2
        s1 = jnp.sqrt((r * w * (losses - mu1) ** 2
                       ).sum(-1, keepdims=True) / n1) + 1e-4
        s2 = jnp.sqrt(((1 - r) * w * (losses - mu2) ** 2
                       ).sum(-1, keepdims=True) / n2) + 1e-4
        pi = n1 / (n1 + n2)
    return cand & (r > 0.5)


@HEADS.register_module()
class PAAHead(ATSSHead):
    """Same tower as ATSS (cls / reg / iou-pred); PAA assignment in loss."""
    topk: int = 9
    loss_iou_weight: float = 0.5
    loss_bbox_weight: float = 1.3

    def loss(self, cls_outs, reg_outs, iou_outs, batch: Dict[str, Any],
             rng=None) -> Dict[str, jnp.ndarray]:
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        gen = self._build_generator()
        level_anchors = [np.asarray(a)
                         for a in gen.grid_anchors(featmap_sizes)]
        level_sizes = [len(a) for a in level_anchors]
        anchors = np.concatenate(level_anchors).astype(np.float32)
        cls_cat, box_cat = self._flatten_preds(cls_outs, reg_outs)
        b, n = cls_cat.shape[:2]
        iou_cat = jnp.concatenate([c.reshape(b, -1) for c in iou_outs], 1)
        means, stds = self._coder_params()
        anchors_j = jnp.asarray(anchors)

        def single(cls_s, box_s, gtb, gtl, gv):
            decoded = delta2bbox(anchors_j, box_s, means, stds)   # (N, 4)
            g = gtb.shape[0]
            # joint loss of every anchor w.r.t. every gt (stop-gradient:
            # assignment must not leak gradients)
            p = jax.lax.stop_gradient(jax.nn.sigmoid(cls_s))      # (N, C)
            p_gt = p[:, jnp.clip(gtl, 0, self.num_classes - 1)]   # (N, G)
            cls_loss = -jnp.log(p_gt + 1e-8) * (1 - p_gt) ** 2 * 0.25
            from ...ops.iou import bbox_overlaps
            iou_ng = jax.lax.stop_gradient(
                bbox_overlaps(decoded, gtb))                      # (N, G)
            joint = cls_loss + (1.0 - iou_ng)                     # (N, G)
            joint = jnp.where(gv[None, :], joint, _BIG)
            # per-level topk lowest-loss candidates
            cand = jnp.zeros((n, g), bool)
            start = 0
            for ls in level_sizes:
                k = min(self.topk, ls)
                kth = -jax.lax.top_k(
                    -joint[start:start + ls].T, k)[0][:, -1]      # (G,)
                cand = cand.at[start:start + ls].set(
                    joint[start:start + ls] <= kth[None, :])
                start += ls
            cand = cand & gv[None, :]
            pos_gn = gmm_split(joint.T, cand.T).T                 # (N, G)
            # anchors claimed by several gts go to the lowest joint loss
            jm = jnp.where(pos_gn, joint, _BIG)
            gt_idx = jnp.argmin(jm, 1)
            pos = jnp.min(jm, 1) < _BIG
            labels = jnp.where(pos, gtl[gt_idx], self.num_classes)
            tgt = gtb[gt_idx]
            iou_t = jax.lax.stop_gradient(
                bbox_overlaps_aligned(decoded, tgt))
            return decoded, tgt, labels, pos, iou_t

        decoded, tgt, labels, pos, iou_t = jax.vmap(single)(
            cls_cat, box_cat, batch["gt_bboxes"], batch["gt_labels"],
            batch["gt_valid"])
        pos_f = pos.astype(jnp.float32)
        num_pos = jnp.maximum(pos_f.sum(), 1.0)

        loss_cls_fn = LOSSES.build(dict(
            self.loss_cls or dict(type="FocalLoss", use_sigmoid=True,
                                  gamma=2.0, alpha=0.25, loss_weight=1.0)))
        loss_cls = loss_cls_fn(cls_cat.reshape(b * n, -1),
                               labels.reshape(-1), avg_factor=num_pos)
        loss_bbox_fn = LOSSES.build(dict(
            self.loss_bbox or dict(type="GIoULoss",
                                   loss_weight=self.loss_bbox_weight)))
        loss_bbox = loss_bbox_fn(decoded.reshape(-1, 4),
                                 tgt.reshape(-1, 4),
                                 weight=pos_f.reshape(-1),
                                 avg_factor=num_pos)
        # IoU prediction branch: BCE against the decoded-box IoU
        t = jnp.where(pos, iou_t, 0.0)
        bce = (jnp.maximum(iou_cat, 0) - iou_cat * t
               + jnp.log1p(jnp.exp(-jnp.abs(iou_cat))))
        loss_iou = self.loss_iou_weight * (bce * pos_f).sum() / num_pos
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "loss_iou": loss_iou, "num_pos": pos_f.sum()}
