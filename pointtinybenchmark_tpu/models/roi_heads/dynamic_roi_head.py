"""Dynamic R-CNN RoI head (arXiv 2004.06002).

Parity target: mmdet models/roi_heads/dynamic_roi_head.py:13 — the assigner's
IoU threshold and the SmoothL1 beta adapt to training statistics: every
`update_iter_interval` iterations, iou_thr := max(initial_iou,
mean(per-image iou_topk-th best proposal IoU)) and beta := min(initial_beta,
median(per-iter beta_topk-th smallest |dx,dy| target)).

TPU redesign: the reference mutates Python attributes between host steps.
Here the adaptive state lives in the `batch_stats` variable collection
(ring-buffer histories + current thresholds), so the whole schedule is
in-graph and flows through the standard mutable-train-step plumbing — the
jitted step stays pure and the thresholds update exactly on the interval.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from ...core.assigners import MaxIoUAssigner
from ...utils.registry import HEADS, LOSSES
from .standard_roi_head import StandardRoIHead

__all__ = ["DynamicRoIHead"]

EPS = 1e-15


@HEADS.register_module()
class DynamicRoIHead(StandardRoIHead):

    @property
    def _dyn_cfg(self) -> dict:
        return dict((self.train_cfg or {}).get("dynamic_rcnn", {}))

    def setup(self):
        super().setup()
        d = self._dyn_cfg
        interval = int(d.get("update_iter_interval", 100))
        init_iou = float(d.get("initial_iou", 0.4))
        init_beta = float(d.get("initial_beta", 1.0))
        self._iou_thr = self.variable(
            "batch_stats", "dynamic_iou_thr",
            lambda: jnp.asarray(init_iou, jnp.float32))
        self._beta = self.variable(
            "batch_stats", "dynamic_beta",
            lambda: jnp.asarray(init_beta, jnp.float32))
        self._iou_hist = self.variable(
            "batch_stats", "dynamic_iou_hist",
            lambda: jnp.zeros((interval,), jnp.float32))
        self._beta_hist = self.variable(
            "batch_stats", "dynamic_beta_hist",
            lambda: jnp.zeros((interval,), jnp.float32))
        self._step = self.variable(
            "batch_stats", "dynamic_step", lambda: jnp.zeros((), jnp.int32))

    def _build_assigner(self, cfg: dict) -> MaxIoUAssigner:
        a = dict(cfg.get("assigner", {}))
        thr = self._iou_thr.value
        return MaxIoUAssigner(
            pos_iou_thr=thr, neg_iou_thr=thr, min_pos_iou=thr,
            match_low_quality=bool(a.get("match_low_quality", False)),
            ignore_iof_thr=float(a.get("ignore_iof_thr", -1)))

    def _record_stats(self, max_ovs, roi_deltas, pos_w) -> None:
        d = self._dyn_cfg
        interval = self._iou_hist.value.shape[0]
        iou_topk = int(d.get("iou_topk", 75))
        beta_topk = int(d.get("beta_topk", 10))
        init_iou = float(d.get("initial_iou", 0.4))
        init_beta = float(d.get("initial_beta", 1.0))
        b = max_ovs.shape[0]

        import jax
        k = min(iou_topk, max_ovs.shape[1])
        cur_iou = jax.lax.top_k(max_ovs, k)[0][:, -1].mean()
        # beta stat: beta_topk*num_imgs-th smallest mean |dx,dy| among pos
        tgt = jnp.abs(roi_deltas[..., :2]).mean(-1).reshape(-1)
        posf = pos_w.reshape(-1) > 0
        kb = min(beta_topk * b, tgt.shape[0])
        # k-th smallest positive target: invalidate negatives with +inf and
        # clamp k to the number of positives (reference min(beta_topk*B, num_pos))
        tgt_sorted = jnp.sort(jnp.where(posf, tgt, jnp.inf))
        num_pos = posf.sum()
        k_eff = jnp.clip(jnp.minimum(kb, num_pos), 1, tgt.shape[0]) - 1
        kth = tgt_sorted[k_eff]
        kth = jnp.where((num_pos > 0) & jnp.isfinite(kth), kth, 0.0)

        step = self._step.value
        idx = step % interval
        iou_hist = self._iou_hist.value.at[idx].set(cur_iou)
        beta_hist = self._beta_hist.value.at[idx].set(kth)
        do_update = (step + 1) % interval == 0
        new_iou = jnp.maximum(init_iou, iou_hist.mean())
        med = jnp.median(beta_hist)
        new_beta = jnp.where(med < EPS, self._beta.value,
                             jnp.minimum(init_beta, med))
        self._iou_thr.value = jnp.where(do_update, new_iou,
                                        self._iou_thr.value)
        self._beta.value = jnp.where(do_update, new_beta, self._beta.value)
        self._iou_hist.value = iou_hist
        self._beta_hist.value = beta_hist
        self._step.value = step + 1

    def _bbox_loss(self, cls_score, bbox_pred, roi_boxes, roi_labels,
                   roi_deltas, pos_w, samp_w, gt_idx
                   ) -> Dict[str, jnp.ndarray]:
        nc = self.num_classes
        loss_cls_fn = LOSSES.build(dict(
            (self.bbox_head or {}).get("loss_cls",
                                       dict(type="CrossEntropyLoss"))))
        labels_flat = roi_labels.reshape(-1)
        samp_flat = samp_w.reshape(-1)
        pos_flat = pos_w.reshape(-1)
        num_sampled = jnp.maximum(samp_flat.sum(), 1.0)
        loss_cls = loss_cls_fn(cls_score, labels_flat, weight=samp_flat,
                               avg_factor=num_sampled)
        if bbox_pred.shape[-1] == 4:
            pred_deltas = bbox_pred
        else:
            safe_lbl = jnp.clip(labels_flat, 0, nc - 1)
            pred_deltas = jnp.take_along_axis(
                bbox_pred.reshape(-1, nc, 4),
                safe_lbl[:, None, None], axis=1)[:, 0]
        # smooth-L1 with the *traced* adaptive beta
        beta = jnp.maximum(self._beta.value, EPS)
        diff = jnp.abs(pred_deltas - roi_deltas.reshape(-1, 4))
        l1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                       diff - 0.5 * beta)
        lw = float((self.bbox_head or {}).get(
            "loss_bbox", {}).get("loss_weight", 1.0))
        loss_bbox = lw * (l1.sum(-1) * pos_flat).sum() / num_sampled
        acc = (jnp.argmax(cls_score, -1) == labels_flat).astype(jnp.float32)
        acc = (acc * samp_flat).sum() / num_sampled * 100
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox, "acc": acc,
                "num_pos": pos_flat.sum(),
                "dynamic_iou_thr": self._iou_thr.value,
                "dynamic_beta": self._beta.value}
