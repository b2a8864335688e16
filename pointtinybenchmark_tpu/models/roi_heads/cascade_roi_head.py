"""CascadeRoIHead — multi-stage box refinement (Cascade R-CNN, CVPR2018).

Parity target: mmdet models/roi_heads/cascade_roi_head.py — per-stage bbox
heads with increasing IoU thresholds (0.5/0.6/0.7), proposals refined by the
previous stage's decoded boxes, stage losses weighted, test-time class
scores averaged across stages.

TPU design: stage transitions are pure array ops (decode + stop_gradient);
the per-stage sample/extract/head passes reuse StandardRoIHead's batched
static-budget machinery.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.bbox import delta_coder_fns
from ...core.samplers import topk_mask
from ...core.post_processing import DetResult, multiclass_nms
from ...utils.registry import HEADS
from ..builder import build_head
__all__ = ["CascadeRoIHead"]


@HEADS.register_module()
class CascadeRoIHead(nn.Module):
    num_stages: int = 3
    stage_loss_weights: Sequence[float] = (1.0, 0.5, 0.25)
    bbox_roi_extractor: Optional[dict] = None
    bbox_head: Optional[Sequence[dict]] = None
    train_cfg: Optional[Sequence[dict]] = None   # list per stage
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        heads = []
        for i in range(self.num_stages):
            cfg = dict(self.bbox_head[i] if isinstance(self.bbox_head,
                                                       (list, tuple))
                       else self.bbox_head)
            heads.append(build_head(cfg))
        self.bbox_heads = heads
        # per-stage StandardRoIHead logic objects (share extractor cfg)
        self._stage_cfgs = [
            dict(self.train_cfg[i]) if isinstance(self.train_cfg,
                                                  (list, tuple))
            else dict(self.train_cfg or {})
            for i in range(self.num_stages)]

    # --- plain config helpers (no Module instantiation in bound methods) --
    def _head_cfg(self, i: int) -> dict:
        return dict(self.bbox_head[i] if isinstance(self.bbox_head,
                                                    (list, tuple))
                    else self.bbox_head)

    @property
    def _ext_cfg(self) -> dict:
        cfg = dict(self.bbox_roi_extractor or {})
        roi_layer = dict(cfg.get("roi_layer", {}))
        return dict(
            featmap_strides=tuple(cfg.get("featmap_strides", (4, 8, 16, 32))),
            output_size=int(roi_layer.get("output_size", 7)),
            sampling_ratio=(int(roi_layer.get("sampling_ratio", 0)) or 2),
            finest_scale=float(cfg.get("finest_scale", 56)),
            aligned=bool(roi_layer.get("aligned", True)))

    def _coder_fns(self, i: int):
        return delta_coder_fns(self._head_cfg(i).get("bbox_coder", {}))

    def _coder_params(self, i: int):
        cfg = dict(self._head_cfg(i).get("bbox_coder", {}))
        return (tuple(cfg.get("target_means", (0., 0., 0., 0.))),
                tuple(cfg.get("target_stds", (0.1, 0.1, 0.2, 0.2))))

    @property
    def num_classes(self) -> int:
        return int(self._head_cfg(0)["num_classes"])

    def _refine(self, i: int, proposals: jnp.ndarray, cls_score, bbox_pred,
                img_shapes) -> jnp.ndarray:
        """Decode stage-i boxes into next-stage proposals (class of max
        score, mmdet regress_by_class)."""
        means, stds = self._coder_params(i)
        bbox2delta, delta2bbox = self._coder_fns(i)
        nc = self.num_classes
        b, p = proposals.shape[:2]
        if bbox_pred.shape[-1] == 4:
            deltas = bbox_pred.reshape(b, p, 4)
        else:
            dl = bbox_pred.reshape(b, p, nc, 4)
            best = jnp.argmax(cls_score.reshape(b, p, nc + 1)[..., :nc], -1)
            deltas = jnp.take_along_axis(dl, best[..., None, None], 2)[:, :, 0]
        boxes = delta2bbox(proposals, deltas, means, stds)
        h = img_shapes[:, 0:1].astype(boxes.dtype)
        w = img_shapes[:, 1:2].astype(boxes.dtype)
        boxes = jnp.stack([
            jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h)], -1)
        return jax.lax.stop_gradient(boxes)

    # -------------------------------------------------------------- train
    def forward_train(self, feats, proposals, prop_valid,
                      batch: Dict[str, Any], rng: jax.Array):
        losses: Dict[str, jnp.ndarray] = {}
        img_shapes = batch["img_shape"]
        for i in range(self.num_stages):
            rng, k = jax.random.split(rng)
            stage_losses, roi_boxes, cls_score, bbox_pred = \
                self._stage_forward_train(i, feats, proposals,
                                          prop_valid, batch, k)
            w = float(self.stage_loss_weights[i])
            for key, v in stage_losses.items():
                if key.startswith("loss"):
                    # keep the "loss" prefix so the train step sums them
                    losses[f"loss_s{i}_{key[5:]}"] = v * w
                else:
                    losses[f"s{i}_{key}"] = v
            if i < self.num_stages - 1:
                proposals = self._refine(i, roi_boxes, cls_score, bbox_pred,
                                         img_shapes)
                prop_valid = jnp.ones(proposals.shape[:2], bool)
        return losses

    def _stage_forward_train(self, i: int, feats,
                             proposals, prop_valid, batch, rng):
        """StandardRoIHead.forward_train equivalent bound to this cascade's
        stage-i head; also returns the sampled rois + raw outputs."""
        from ...core.assigners import MaxIoUAssigner
        from ...utils.registry import LOSSES

        cfg = dict(self._stage_cfgs[i] or {})
        assigner_cfg = dict(cfg.get("assigner", dict(
            pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
            match_low_quality=False, ignore_iof_thr=-1)))
        assigner_cfg.pop("type", None)
        assigner = MaxIoUAssigner(**assigner_cfg)
        sampler_cfg = dict(cfg.get("sampler", dict(
            num=512, pos_fraction=0.25, add_gt_as_proposals=True)))
        sampler_cfg.pop("type", None)
        num_sample = int(sampler_cfg.get("num", 512))
        pos_fraction = float(sampler_cfg.get("pos_fraction", 0.25))
        add_gt = bool(sampler_cfg.get("add_gt_as_proposals", i == 0))
        pos_budget = int(num_sample * pos_fraction)
        means, stds = self._coder_params(i)
        bbox2delta, delta2bbox = self._coder_fns(i)
        nc = self.num_classes

        gt_bboxes = batch["gt_bboxes"]
        gt_labels = batch["gt_labels"]
        gt_valid = batch["gt_valid"]
        b = proposals.shape[0]
        if add_gt:
            proposals = jnp.concatenate([gt_bboxes, proposals], 1)
            prop_valid = jnp.concatenate([gt_valid, prop_valid], 1)
        proposals = jax.lax.stop_gradient(proposals)
        p = proposals.shape[1]

        def assign_sample(props, pv, gtb, gtl, gv, key):
            assigned, _, _ = assigner.assign(props, gtb, gv, gtl,
                                             bbox_valid=pv)
            pos_cand = assigned > 0
            neg_cand = assigned == 0
            kp, kn = jax.random.split(key)
            pr_pos = jnp.where(pos_cand, jax.random.uniform(kp, (p,)), -1.0)
            pos_th = jax.lax.top_k(pr_pos, min(pos_budget, p))[0][-1]
            pos_sel = pos_cand & (pr_pos >= jnp.maximum(pos_th, 0.0))
            n_pos = pos_sel.sum()
            neg_budget = num_sample - jnp.minimum(n_pos, pos_budget)
            pr_neg = jnp.where(neg_cand, jax.random.uniform(kn, (p,)), -1.0)
            neg_sel = neg_cand & topk_mask(pr_neg, neg_budget)
            key_score = (pos_sel.astype(jnp.float32) * 2.0
                         + neg_sel.astype(jnp.float32)
                         + jax.random.uniform(jax.random.fold_in(key, 7),
                                              (p,)) * 0.1)
            _, idx = jax.lax.top_k(key_score, min(num_sample, p))
            sel_boxes = props[idx]
            sel_assigned = assigned[idx]
            sel_pos = pos_sel[idx]
            sel_sampled = (pos_sel | neg_sel)[idx]
            safe = jnp.clip(sel_assigned - 1, 0, gtb.shape[0] - 1)
            deltas = bbox2delta(sel_boxes, gtb[safe], means, stds)
            sel_labels = jnp.where(sel_pos, gtl[safe], nc)
            return (sel_boxes, sel_labels, deltas,
                    sel_pos.astype(jnp.float32),
                    sel_sampled.astype(jnp.float32))

        keys = jax.random.split(rng, b)
        roi_boxes, roi_labels, roi_deltas, pos_w, samp_w = jax.vmap(
            assign_sample)(proposals, prop_valid, gt_bboxes, gt_labels,
                           gt_valid, keys)
        s = roi_boxes.shape[1]
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), s)[:, None]
        rois = jnp.concatenate([batch_idx, roi_boxes.reshape(b * s, 4)], 1)
        roi_feats = self._extract(feats, rois)
        cls_score, bbox_pred = self.bbox_heads[i](roi_feats)

        head_cfg = self._head_cfg(i)
        loss_cls_fn = LOSSES.build(dict(head_cfg.get(
            "loss_cls", dict(type="CrossEntropyLoss"))))
        loss_bbox_fn = LOSSES.build(dict(head_cfg.get(
            "loss_bbox", dict(type="SmoothL1Loss", beta=1.0))))
        labels_flat = roi_labels.reshape(-1)
        samp_flat = samp_w.reshape(-1)
        pos_flat = pos_w.reshape(-1)
        num_sampled = jnp.maximum(samp_flat.sum(), 1.0)
        loss_cls = loss_cls_fn(cls_score, labels_flat, weight=samp_flat,
                               avg_factor=num_sampled)
        if bbox_pred.shape[-1] == 4:
            pred_deltas = bbox_pred
        else:
            pd = bbox_pred.reshape(-1, nc, 4)
            safe_lbl = jnp.clip(labels_flat, 0, nc - 1)
            pred_deltas = jnp.take_along_axis(
                pd, safe_lbl[:, None, None], 1)[:, 0]
        loss_bbox = loss_bbox_fn(pred_deltas, roi_deltas.reshape(-1, 4),
                                 weight=pos_flat[:, None],
                                 avg_factor=num_sampled)
        losses = {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                  "num_pos": pos_flat.sum()}
        return (losses, roi_boxes,
                cls_score.reshape(b, s, -1), bbox_pred.reshape(b, s, -1))

    def _extract(self, feats, rois):
        from .roi_extractor import single_roi_extract
        ec = self._ext_cfg
        n_lvl = len(ec["featmap_strides"])
        return single_roi_extract(feats[:n_lvl], rois,
                                  ec["featmap_strides"], ec["output_size"],
                                  ec["sampling_ratio"], ec["finest_scale"],
                                  ec["aligned"])

    # ------------------------------------------------------------ test
    def simple_test(self, feats, proposals, prop_valid, img_shapes,
                    scale_factors=None, rescale: bool = False) -> DetResult:
        cfg = dict(self.test_cfg or {})
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg.get("nms", {}).get("iou_threshold", 0.5))
        max_per_img = int(cfg.get("max_per_img", 100))
        b, p = proposals.shape[:2]
        nc = self.num_classes
        means, stds = self._coder_params(0)
        bbox2delta, delta2bbox = self._coder_fns(0)

        scores_sum = 0.0
        boxes = proposals
        last_pred = None
        for i in range(self.num_stages):
            batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), p)[:, None]
            rois = jnp.concatenate([batch_idx, boxes.reshape(b * p, 4)], 1)
            roi_feats = self._extract(feats, rois)
            cls_score, bbox_pred = self.bbox_heads[i](roi_feats)
            scores_sum = scores_sum + jax.nn.softmax(
                cls_score.reshape(b, p, nc + 1), -1)
            last_pred = bbox_pred.reshape(b, p, -1)
            if i < self.num_stages - 1:
                boxes = self._refine(i, boxes, cls_score.reshape(b, p, -1),
                                     last_pred, img_shapes)
        scores = scores_sum / self.num_stages

        def single(props, dlt, sc, pv, img_shape, scale_factor):
            if dlt.shape[-1] == 4:
                d = jnp.broadcast_to(dlt[:, None, :], (p, nc, 4))
            else:
                d = dlt.reshape(p, nc, 4)
            bx = delta2bbox(props[:, None, :], d, means, stds)
            bx = jnp.stack([
                jnp.clip(bx[..., 0], 0, img_shape[1]),
                jnp.clip(bx[..., 1], 0, img_shape[0]),
                jnp.clip(bx[..., 2], 0, img_shape[1]),
                jnp.clip(bx[..., 3], 0, img_shape[0])], -1)
            if rescale and scale_factor is not None:
                bx = bx / scale_factor
            return multiclass_nms(bx.reshape(p, nc * 4), sc, score_thr,
                                  iou_thr, max_per_img, valid_mask=pv)

        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        return jax.vmap(single)(boxes, last_pred, scores, prop_valid,
                                img_shapes, sf)
