"""StandardRoIHead — second stage of Faster R-CNN.

Parity target: mmdet models/roi_heads/standard_roi_head.py:372 (+
bbox_head target/loss logic from bbox_head.py): assign proposals to gts
(MaxIoU, match_low_quality=False), RandomSampler 512 @ pos_fraction 0.25
with add_gt_as_proposals, RoIAlign over FPN levels, Shared2FC head, CE +
SmoothL1; test: per-class delta decode + multiclass NMS.

TPU design: sampling keeps static shapes — the 512-RoI minibatch is a
fixed-size gather driven by random-priority top-k over the sampled masks;
unsampled slots carry zero loss weight. All B images are processed in one
fused RoIAlign + head pass.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.assigners import MaxIoUAssigner
from ...core.bbox import delta_coder_fns
from ...core.samplers import topk_mask
from ...core.post_processing import DetResult, multiclass_nms
from ...utils.registry import HEADS, LOSSES
from ..builder import build_head
from .roi_extractor import generic_roi_extract, single_roi_extract

__all__ = ["StandardRoIHead"]


@HEADS.register_module()
class StandardRoIHead(nn.Module):
    bbox_roi_extractor: Optional[dict] = None
    bbox_head: Optional[dict] = None
    mask_roi_extractor: Optional[dict] = None
    mask_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.bbox_head_m = build_head(dict(self.bbox_head))
        self.mask_head_m = (build_head(dict(self.mask_head))
                            if self.mask_head else None)

    # ------------------------------------------------------------- config
    @property
    def _extractor_cfg(self) -> dict:
        cfg = dict(self.bbox_roi_extractor or {})
        roi_layer = dict(cfg.get("roi_layer", {}))
        return dict(
            featmap_strides=tuple(cfg.get("featmap_strides", (4, 8, 16, 32))),
            output_size=int(roi_layer.get("output_size", 7)),
            sampling_ratio=(int(roi_layer.get("sampling_ratio", 0)) or 2),
            finest_scale=float(cfg.get("finest_scale", 56)),
            aligned=bool(roi_layer.get("aligned", True)),
            generic=cfg.get("type") == "GenericRoIExtractor",
            aggregation=str(cfg.get("aggregation", "sum")),
            use_pallas=bool(cfg.get("use_pallas", False)))

    def _coder_params(self):
        cfg = dict((self.bbox_head or {}).get("bbox_coder", {}))
        return (tuple(cfg.get("target_means", (0., 0., 0., 0.))),
                tuple(cfg.get("target_stds", (0.1, 0.1, 0.2, 0.2))))

    def _coder_fns(self):
        return delta_coder_fns((self.bbox_head or {}).get("bbox_coder", {}))

    @property
    def num_classes(self) -> int:
        return int(self.bbox_head["num_classes"])

    @property
    def _mask_extractor_cfg(self) -> dict:
        """The mask branch's own extractor (mmdet mask_roi_extractor:
        RoIAlign output_size=14 in the stock MaskRCNN config), falling
        back to the bbox extractor when share_roi_extractor semantics
        apply (mask_roi_extractor=None)."""
        cfg = dict(self.mask_roi_extractor or self.bbox_roi_extractor or {})
        roi_layer = dict(cfg.get("roi_layer", {}))
        return dict(
            featmap_strides=tuple(cfg.get("featmap_strides", (4, 8, 16, 32))),
            output_size=int(roi_layer.get("output_size", 14)),
            sampling_ratio=(int(roi_layer.get("sampling_ratio", 0)) or 2),
            finest_scale=float(cfg.get("finest_scale", 56)),
            aligned=bool(roi_layer.get("aligned", True)),
            use_pallas=bool(cfg.get("use_pallas", False)))

    # ------------------------------------------------------------- extract
    def _extract(self, feats, rois: jnp.ndarray) -> jnp.ndarray:
        ec = self._extractor_cfg
        n_lvl = len(ec["featmap_strides"])
        if ec.get("generic"):
            # GRoIE (mmdet GenericRoIExtractor, configs/groie): aggregate
            # over all levels instead of routing to one
            return generic_roi_extract(
                feats[:n_lvl], rois, ec["featmap_strides"],
                ec["output_size"], ec["sampling_ratio"], ec["aggregation"])
        return single_roi_extract(feats[:n_lvl], rois,
                                  ec["featmap_strides"], ec["output_size"],
                                  ec["sampling_ratio"], ec["finest_scale"],
                                  ec["aligned"],
                                  use_pallas=ec.get("use_pallas", False))

    def _extract_mask(self, feats, rois: jnp.ndarray) -> jnp.ndarray:
        ec = self._mask_extractor_cfg
        n_lvl = len(ec["featmap_strides"])
        return single_roi_extract(feats[:n_lvl], rois,
                                  ec["featmap_strides"], ec["output_size"],
                                  ec["sampling_ratio"], ec["finest_scale"],
                                  ec["aligned"],
                                  use_pallas=ec.get("use_pallas", False))

    # -------------------------------------------------------------- train
    def forward_train(self, feats, proposals: jnp.ndarray,
                      prop_valid: jnp.ndarray, batch: Dict[str, Any],
                      rng: jax.Array) -> Dict[str, jnp.ndarray]:
        cfg = dict(self.train_cfg or {})
        assigner = self._build_assigner(cfg)
        sampler_cfg = dict(cfg.get("sampler", dict(
            type="RandomSampler", num=512, pos_fraction=0.25,
            neg_pos_ub=-1, add_gt_as_proposals=True)))
        num_sample = int(sampler_cfg.get("num", 512))
        pos_fraction = float(sampler_cfg.get("pos_fraction", 0.25))
        add_gt = bool(sampler_cfg.get("add_gt_as_proposals", True))
        pos_budget = int(num_sample * pos_fraction)
        means, stds = self._coder_params()
        bbox2delta, delta2bbox = self._coder_fns()
        nc = self.num_classes

        gt_bboxes = batch["gt_bboxes"]
        gt_labels = batch["gt_labels"]
        gt_valid = batch["gt_valid"]
        b = proposals.shape[0]

        if add_gt:
            proposals = jnp.concatenate([gt_bboxes, proposals], axis=1)
            prop_valid = jnp.concatenate([gt_valid, prop_valid], axis=1)
        # stop grads through proposal coordinates
        proposals = jax.lax.stop_gradient(proposals)
        p = proposals.shape[1]

        def assign_sample(props, pv, gtb, gtl, gv, key):
            assigned, max_ov, labels = assigner.assign(
                props, gtb, gv, gtl, bbox_valid=pv)
            pos_cand = assigned > 0
            neg_cand = assigned == 0
            kp, kn = jax.random.split(key)
            # random-priority top-k within budgets (static shapes)
            pr_pos = jnp.where(pos_cand, jax.random.uniform(kp, (p,)), -1.0)
            pos_th = jax.lax.top_k(pr_pos, min(pos_budget, p))[0][-1]
            pos_sel = pos_cand & (pr_pos >= jnp.maximum(pos_th, 0.0))
            n_pos = pos_sel.sum()
            neg_budget = num_sample - jnp.minimum(n_pos, pos_budget)
            pr_neg = jnp.where(neg_cand, jax.random.uniform(kn, (p,)), -1.0)
            neg_sel = neg_cand & topk_mask(pr_neg, neg_budget)
            sampled = pos_sel | neg_sel
            # fixed-size gather of the sampled rois
            key_score = (pos_sel.astype(jnp.float32) * 2.0
                         + neg_sel.astype(jnp.float32)
                         + jax.random.uniform(jax.random.fold_in(key, 7), (p,)) * 0.1)
            _, idx = jax.lax.top_k(key_score, min(num_sample, p))
            sel_boxes = props[idx]
            sel_assigned = assigned[idx]
            sel_sampled = sampled[idx]
            sel_pos = pos_sel[idx]
            safe = jnp.clip(sel_assigned - 1, 0, gtb.shape[0] - 1)
            tgt_boxes = gtb[safe]
            deltas = bbox2delta(sel_boxes, tgt_boxes, means, stds)
            sel_labels = jnp.where(sel_pos, gtl[safe], nc)
            return (sel_boxes, sel_labels, deltas,
                    sel_pos.astype(jnp.float32),
                    sel_sampled.astype(jnp.float32), safe, max_ov)

        keys = jax.random.split(rng, b)
        (roi_boxes, roi_labels, roi_deltas, pos_w, samp_w, gt_idx,
         max_ovs) = jax.vmap(
            assign_sample)(proposals, prop_valid, gt_bboxes, gt_labels,
                           gt_valid, keys)
        self._record_stats(max_ovs, roi_deltas, pos_w)

        s = roi_boxes.shape[1]
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), s)[:, None]
        rois = jnp.concatenate([batch_idx,
                                roi_boxes.reshape(b * s, 4)], axis=1)
        roi_feats = self._extract(feats, rois)
        cls_score, bbox_pred = self.bbox_head_m(roi_feats)

        out = self._bbox_loss(cls_score, bbox_pred, roi_boxes, roi_labels,
                              roi_deltas, pos_w, samp_w, gt_idx)

        if self.mask_head_m is not None and "gt_masks" in batch:
            out.update(self._mask_loss(feats, rois, roi_labels, pos_w,
                                       gt_idx, batch))
        return out

    def _mask_loss(self, feats, rois, roi_labels, pos_w, gt_idx,
                   batch) -> Dict[str, jnp.ndarray]:
        from .mask_head import mask_target
        nc = self.num_classes
        # mmdet runs the mask branch on POSITIVE rois only
        # (standard_roi_head.py _mask_forward_train: pos_rois). The sampler
        # already caps positives at num*pos_fraction per image, so a static
        # per-image top-k gather of that budget captures every positive
        # while cutting mask-branch compute (512 -> 128 rois at stock cfg).
        b, s = pos_w.shape
        scfg = dict((self.train_cfg or {}).get("sampler", {}))
        pos_budget = max(1, int(int(scfg.get("num", 512))
                                * float(scfg.get("pos_fraction", 0.25))))
        pos_budget = min(pos_budget, s)
        _, sel = jax.lax.top_k(pos_w, pos_budget)            # (B, K)
        sel_flat = (sel + jnp.arange(b)[:, None] * s).reshape(-1)
        rois = rois[sel_flat]
        labels_flat = jnp.take_along_axis(roi_labels, sel, 1).reshape(-1)
        pos_flat = jnp.take_along_axis(pos_w, sel, 1).reshape(-1)
        gt_idx = jnp.take_along_axis(gt_idx, sel, 1)
        mask_feats = self._extract_mask(feats, rois)
        mask_logits = self.mask_head_m(mask_feats)  # (B*K, 2s, 2s, nc)
        msz = mask_logits.shape[1]
        targets = mask_target(batch["gt_masks"].astype(jnp.float32),
                              rois, gt_idx.reshape(-1), msz)
        safe_lbl = jnp.clip(labels_flat, 0, nc - 1)
        logits_cls = jnp.take_along_axis(
            mask_logits, safe_lbl[:, None, None, None], -1)[..., 0]
        bce = (jnp.maximum(logits_cls, 0) - logits_cls * targets
               + jnp.log1p(jnp.exp(-jnp.abs(logits_cls))))
        num_pos_m = jnp.maximum(pos_flat.sum(), 1.0)
        out = {"loss_mask": ((bce.mean(axis=(1, 2)) * pos_flat).sum()
                             / num_pos_m)}
        self._mask_extras(out, mask_feats, mask_logits, logits_cls, targets,
                          rois, labels_flat, pos_flat, gt_idx, batch)
        return out

    def _mask_extras(self, out, mask_feats, mask_logits, logits_cls,
                     targets, rois, labels_flat, pos_flat, gt_idx,
                     batch) -> None:
        """Extension hook (Mask Scoring adds the mask-IoU loss here)."""

    # --------------------------------------------------------------- hooks
    def _build_assigner(self, cfg: dict) -> MaxIoUAssigner:
        assigner_cfg = dict(cfg.get("assigner", dict(
            type="MaxIoUAssigner", pos_iou_thr=0.5, neg_iou_thr=0.5,
            min_pos_iou=0.5, match_low_quality=False, ignore_iof_thr=-1)))
        assigner_cfg.pop("type", None)
        return MaxIoUAssigner(**assigner_cfg)

    def _record_stats(self, max_ovs, roi_deltas, pos_w) -> None:
        """Training-statistics hook (Dynamic R-CNN overrides)."""

    # ----------------------------------------------------------- bbox loss
    def _bbox_loss(self, cls_score, bbox_pred, roi_boxes, roi_labels,
                   roi_deltas, pos_w, samp_w, gt_idx
                   ) -> Dict[str, jnp.ndarray]:
        """Compute cls/reg losses from sampled-RoI targets. Split out so
        variants (PISA) can reweight (mmdet pisa_roi_head.py pattern)."""
        nc = self.num_classes
        loss_cls_fn = LOSSES.build(dict(
            (self.bbox_head or {}).get("loss_cls",
                                       dict(type="CrossEntropyLoss"))))
        loss_bbox_fn = LOSSES.build(dict(
            (self.bbox_head or {}).get("loss_bbox",
                                       dict(type="L1Loss"))))
        labels_flat = roi_labels.reshape(-1)
        samp_flat = samp_w.reshape(-1)
        pos_flat = pos_w.reshape(-1)
        num_sampled = jnp.maximum(samp_flat.sum(), 1.0)
        loss_cls = loss_cls_fn(cls_score, labels_flat, weight=samp_flat,
                               avg_factor=num_sampled)
        # class-wise regression: pick the gt class's 4 deltas
        if bbox_pred.shape[-1] == 4:
            pred_deltas = bbox_pred
        else:
            pred_deltas = bbox_pred.reshape(-1, nc, 4)
            safe_lbl = jnp.clip(labels_flat, 0, nc - 1)
            pred_deltas = jnp.take_along_axis(
                pred_deltas, safe_lbl[:, None, None], axis=1)[:, 0]
        loss_bbox = loss_bbox_fn(pred_deltas, roi_deltas.reshape(-1, 4),
                                 weight=pos_flat[:, None],
                                 avg_factor=num_sampled)
        acc = (jnp.argmax(cls_score, -1) == labels_flat).astype(jnp.float32)
        acc = (acc * samp_flat).sum() / num_sampled * 100
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox, "acc": acc,
                "num_pos": pos_flat.sum()}

    # ------------------------------------------------------------ test
    def simple_test(self, feats, proposals: jnp.ndarray,
                    prop_valid: jnp.ndarray, img_shapes,
                    scale_factors=None, rescale: bool = False) -> DetResult:
        cfg = dict(self.test_cfg or {})
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg.get("nms", {}).get("iou_threshold", 0.5))
        max_per_img = int(cfg.get("max_per_img", 100))
        means, stds = self._coder_params()
        bbox2delta, delta2bbox = self._coder_fns()
        nc = self.num_classes

        b, p = proposals.shape[:2]
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), p)[:, None]
        rois = jnp.concatenate([batch_idx, proposals.reshape(b * p, 4)], 1)
        roi_feats = self._extract(feats, rois)
        cls_score, bbox_pred = self.bbox_head_m(roi_feats)
        scores = jax.nn.softmax(cls_score, -1).reshape(b, p, nc + 1)
        if bbox_pred.shape[-1] == 4:
            deltas = bbox_pred.reshape(b, p, 1, 4)
            deltas = jnp.broadcast_to(deltas, (b, p, nc, 4))
        else:
            deltas = bbox_pred.reshape(b, p, nc, 4)

        def single(props, dlt, sc, pv, img_shape, scale_factor):
            boxes = delta2bbox(props[:, None, :], dlt, means, stds)  # (P,C,4)
            boxes = jnp.stack([
                jnp.clip(boxes[..., 0], 0, img_shape[1]),
                jnp.clip(boxes[..., 1], 0, img_shape[0]),
                jnp.clip(boxes[..., 2], 0, img_shape[1]),
                jnp.clip(boxes[..., 3], 0, img_shape[0])], -1)
            if rescale and scale_factor is not None:
                boxes = boxes / scale_factor
            return multiclass_nms(boxes.reshape(p, nc * 4), sc, score_thr,
                                  iou_thr, max_per_img, valid_mask=pv)

        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        dets = jax.vmap(single)(proposals, deltas, scores, prop_valid,
                                img_shapes, sf)
        if self.mask_head_m is None:
            return dets
        # mask branch on the final detections (boxes back in network frame)
        det_boxes = dets.bboxes[..., :4]
        if rescale and scale_factors is not None:
            det_boxes = det_boxes * scale_factors[:, None, :]
        m = det_boxes.shape[1]
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), m)[:, None]
        mask_rois = jnp.concatenate(
            [batch_idx, det_boxes.reshape(b * m, 4)], 1)
        mask_feats = self._extract_mask(feats, mask_rois)
        mask_logits = self.mask_head_m(mask_feats)
        msz = mask_logits.shape[1]
        safe_lbl = jnp.clip(dets.labels.reshape(-1), 0, nc - 1)
        masks = jax.nn.sigmoid(jnp.take_along_axis(
            mask_logits, safe_lbl[:, None, None, None], -1)[..., 0])
        return dets, masks.reshape(b, m, msz, msz)
