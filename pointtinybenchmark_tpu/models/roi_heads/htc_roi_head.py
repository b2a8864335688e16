"""HTC — Hybrid Task Cascade (arXiv 1901.07518).

Parity targets:
- mmdet models/roi_heads/htc_roi_head.py (HybridTaskCascadeRoIHead):
  cascade box stages interleaved with per-stage mask heads, mask information
  flow (stage i's mask head consumes stage i-1's mask conv features through a
  1x1 residual conv), and a fused semantic branch whose RoI features are
  added into both box and mask features (`semantic_fusion`).
- mmdet models/roi_heads/mask_heads/htc_mask_head.py (HTCMaskHead): FCN mask
  head + `conv_res` residual input.
- mmdet models/roi_heads/mask_heads/fused_semantic_head.py
  (FusedSemanticHead): all pyramid levels resized to the `fusion_level`
  (stride-8) map, 1x1-laterals summed, conv stack -> stuff+thing seg logits
  (CE loss, weight 0.2) + an embedding feature for RoI fusion.

TPU design notes: the interleaved mask branch reuses the *same* sampled RoI
set as the box branch of its stage, with boxes refined by the stage's own
regression (mmdet's interleaved refinement of pos rois) — sampling again
would add a second assign pass per stage for no accuracy gain at static
shapes. Semantic targets are rasterized on device from the padded
(B, G, H, W) gt-mask bitmaps when no explicit `gt_semantic_seg` is given
(thing-only semantics — the benchmark datasets carry no stuff labels).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


from ...utils.registry import HEADS
from .cascade_roi_head import CascadeRoIHead
from .mask_head import mask_target
from .roi_extractor import single_roi_extract
from ...core.samplers import topk_mask

__all__ = ["HTCMaskHead", "FusedSemanticHead", "HybridTaskCascadeRoIHead"]


@HEADS.register_module()
class HTCMaskHead(nn.Module):
    """FCNMaskHead + residual info-flow input (htc_mask_head.py:8)."""
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 80
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, res_feat: Optional[jnp.ndarray] = None,
                 return_logits: bool = True, return_feat: bool = True):
        if res_feat is not None:
            x = x + nn.Conv(self.conv_out_channels, (1, 1), dtype=self.dtype,
                            name="conv_res")(res_feat)
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                                dtype=self.dtype, name=f"conv{i}")(x))
        feat = x
        outs = []
        if return_logits:
            y = nn.relu(nn.ConvTranspose(self.conv_out_channels, (2, 2),
                                         strides=(2, 2), dtype=self.dtype,
                                         name="upsample")(x))
            logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.001),
                             name="conv_logits")(y)
            outs.append(logits)
        if return_feat:
            outs.append(feat)
        return outs[0] if len(outs) == 1 else tuple(outs)


@HEADS.register_module()
class FusedSemanticHead(nn.Module):
    """Multi-level fusion semantic head (fused_semantic_head.py:12)."""
    num_ins: int = 5
    fusion_level: int = 1
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 183
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """feats: pyramid (B, Hi, Wi, C). Returns (seg_logits, fused_feat)
        at the fusion level's resolution."""
        tgt = feats[self.fusion_level]
        h, w = tgt.shape[1], tgt.shape[2]
        x = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{self.fusion_level}")(tgt)
        for i, f in enumerate(feats[:self.num_ins]):
            if i == self.fusion_level:
                continue
            y = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype,
                        name=f"lateral{i}")(f)
            y = jax.image.resize(y, (y.shape[0], h, w, y.shape[3]),
                                 method="bilinear")
            x = x + y
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                                dtype=self.dtype, name=f"conv{i}")(x))
        embed = nn.relu(nn.Conv(self.conv_out_channels, (1, 1),
                                dtype=self.dtype, name="conv_embedding")(x))
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name="conv_logits")(x)
        return logits, embed


@HEADS.register_module()
class HybridTaskCascadeRoIHead(CascadeRoIHead):
    mask_head: Optional[Any] = None          # dict or per-stage list
    semantic_head: Optional[dict] = None
    semantic_roi_extractor: Optional[dict] = None
    semantic_fusion: Sequence[str] = ("bbox", "mask")
    interleaved: bool = True
    mask_info_flow: bool = True

    def setup(self):
        super().setup()
        mask_heads = []
        if self.mask_head is not None:
            for i in range(self.num_stages):
                cfg = dict(self.mask_head[i]
                           if isinstance(self.mask_head, (list, tuple))
                           else self.mask_head)
                cfg.pop("type", None)
                mask_heads.append(HTCMaskHead(**cfg))
        self.mask_heads = mask_heads
        if self.semantic_head is not None:
            cfg = dict(self.semantic_head)
            cfg.pop("type", None)
            self.semantic_head_m = FusedSemanticHead(**cfg)
        else:
            self.semantic_head_m = None

    # ------------------------------------------------------------ semantic
    def _semantic_roi(self, semantic_feat, rois, out_size):
        cfg = dict(self.semantic_roi_extractor or {})
        stride = tuple(cfg.get("featmap_strides", (8,)))
        return single_roi_extract((semantic_feat,), rois, stride, out_size,
                                  sampling_ratio=2,
                                  finest_scale=1e8)  # single level

    def _semantic_loss(self, seg_logits, batch) -> jnp.ndarray:
        """CE at the fusion-level resolution (fused_semantic_head.py loss,
        weight 0.2). Targets: explicit `gt_semantic_seg` (B, H, W) int, or
        thing-painting of the gt instance bitmaps."""
        b, h, w, nc_s = seg_logits.shape
        if "gt_semantic_seg" in batch:
            seg = batch["gt_semantic_seg"].astype(jnp.int32)
        else:
            gm = batch["gt_masks"].astype(jnp.float32)       # (B, G, H, W)
            lbl = batch["gt_labels"].astype(jnp.int32) + 1   # 0 = background
            val = batch["gt_valid"][..., None, None]
            painted = jnp.max(
                jnp.where(val & (gm > 0.5), lbl[..., None, None], 0), axis=1)
            seg = painted
        seg_small = jax.image.resize(
            seg.astype(jnp.float32)[..., None], (b, h, w, 1),
            method="nearest")[..., 0].astype(jnp.int32)
        ignore = seg_small == 255
        tgt = jnp.clip(seg_small, 0, nc_s - 1)
        logp = jax.nn.log_softmax(seg_logits, -1)
        ce = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        valid = (~ignore).astype(jnp.float32)
        return 0.2 * (ce * valid).sum() / jnp.maximum(valid.sum(), 1.0)

    # -------------------------------------------------------------- train
    def forward_train(self, feats, proposals, prop_valid,
                      batch: Dict[str, Any], rng: jax.Array):
        losses: Dict[str, jnp.ndarray] = {}
        img_shapes = batch["img_shape"]
        semantic_feat = None
        if self.semantic_head_m is not None:
            seg_logits, semantic_feat = self.semantic_head_m(feats)
            losses["loss_semantic_seg"] = self._semantic_loss(seg_logits,
                                                              batch)
        have_masks = self.mask_heads and "gt_masks" in batch
        for i in range(self.num_stages):
            rng, k = jax.random.split(rng)
            (stage_losses, roi_boxes, cls_score, bbox_pred, rois, roi_labels,
             pos_w, gt_idx) = self._stage_forward_train_htc(
                i, feats, proposals, prop_valid, batch, k, semantic_feat)
            w = float(self.stage_loss_weights[i])
            for key, v in stage_losses.items():
                if key.startswith("loss"):
                    losses[f"loss_s{i}_{key[5:]}"] = v * w
                else:
                    losses[f"s{i}_{key}"] = v

            if have_masks:
                # interleaved: mask branch sees this stage's refined boxes
                if self.interleaved:
                    refined = self._refine(i, roi_boxes, cls_score,
                                           bbox_pred, img_shapes)
                    b, s = refined.shape[:2]
                    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.float32),
                                      s)[:, None]
                    mask_rois = jnp.concatenate(
                        [bidx, refined.reshape(b * s, 4)], 1)
                else:
                    mask_rois = rois
                losses[f"loss_s{i}_mask"] = w * self._mask_stage_loss(
                    i, feats, mask_rois, roi_labels, pos_w, gt_idx, batch,
                    semantic_feat)
            if i < self.num_stages - 1:
                proposals = self._refine(i, roi_boxes, cls_score, bbox_pred,
                                         img_shapes)
                prop_valid = jnp.ones(proposals.shape[:2], bool)
        return losses

    def _stage_forward_train_htc(self, i, feats, proposals, prop_valid,
                                 batch, rng, semantic_feat):
        """CascadeRoIHead._stage_forward_train + semantic RoI fusion; also
        returns the sampled rois/labels for the mask branch."""
        from ...core.assigners import MaxIoUAssigner
        from ...core.bbox import bbox2delta
        from ...utils.registry import LOSSES

        cfg = dict(self._stage_cfgs[i] or {})
        assigner_cfg = dict(cfg.get("assigner", dict(
            pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
            match_low_quality=False, ignore_iof_thr=-1)))
        assigner_cfg.pop("type", None)
        assigner = MaxIoUAssigner(**assigner_cfg)
        sampler_cfg = dict(cfg.get("sampler", dict(
            num=512, pos_fraction=0.25, add_gt_as_proposals=True)))
        num_sample = int(sampler_cfg.get("num", 512))
        pos_fraction = float(sampler_cfg.get("pos_fraction", 0.25))
        add_gt = bool(sampler_cfg.get("add_gt_as_proposals", True))
        pos_budget = int(num_sample * pos_fraction)
        means, stds = self._coder_params(i)
        nc = self.num_classes

        gt_bboxes, gt_labels = batch["gt_bboxes"], batch["gt_labels"]
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
                    sel_sampled.astype(jnp.float32), safe)

        keys = jax.random.split(rng, b)
        (roi_boxes, roi_labels, roi_deltas, pos_w, samp_w,
         gt_idx) = jax.vmap(assign_sample)(proposals, prop_valid, gt_bboxes,
                                           gt_labels, gt_valid, keys)
        s = roi_boxes.shape[1]
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), s)[:, None]
        rois = jnp.concatenate([batch_idx, roi_boxes.reshape(b * s, 4)], 1)
        roi_feats = self._extract(feats, rois)
        if semantic_feat is not None and "bbox" in self.semantic_fusion:
            roi_feats = roi_feats + self._semantic_roi(
                semantic_feat, rois, roi_feats.shape[1])
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
        return (losses, roi_boxes, cls_score.reshape(b, s, -1),
                bbox_pred.reshape(b, s, -1), rois, roi_labels, pos_w, gt_idx)

    def _mask_stage_loss(self, i, feats, rois, roi_labels, pos_w, gt_idx,
                         batch, semantic_feat) -> jnp.ndarray:
        nc = self.num_classes
        mask_feats = self._extract(feats, rois)
        if semantic_feat is not None and "mask" in self.semantic_fusion:
            mask_feats = mask_feats + self._semantic_roi(
                semantic_feat, rois, mask_feats.shape[1])
        last_feat = None
        if self.mask_info_flow:
            for j in range(i):
                last_feat = self.mask_heads[j](mask_feats, last_feat,
                                               return_logits=False)
            mask_logits = self.mask_heads[i](mask_feats, last_feat,
                                             return_feat=False)
        else:
            mask_logits = self.mask_heads[i](mask_feats, return_feat=False)
        msz = mask_logits.shape[1]
        targets = mask_target(batch["gt_masks"].astype(jnp.float32), rois,
                              gt_idx.reshape(-1), msz)
        labels_flat = roi_labels.reshape(-1)
        pos_flat = pos_w.reshape(-1)
        safe_lbl = jnp.clip(labels_flat, 0, nc - 1)
        logits_cls = jnp.take_along_axis(
            mask_logits, safe_lbl[:, None, None, None], -1)[..., 0]
        bce = (jnp.maximum(logits_cls, 0) - logits_cls * targets
               + jnp.log1p(jnp.exp(-jnp.abs(logits_cls))))
        return ((bce.mean(axis=(1, 2)) * pos_flat).sum()
                / jnp.maximum(pos_flat.sum(), 1.0))

    # ------------------------------------------------------------ test
    def simple_test(self, feats, proposals, prop_valid, img_shapes,
                    scale_factors=None, rescale: bool = False):
        semantic_feat = None
        if self.semantic_head_m is not None:
            _, semantic_feat = self.semantic_head_m(feats)
        dets = self._cascade_test_boxes(feats, proposals, prop_valid,
                                        img_shapes, scale_factors, rescale,
                                        semantic_feat)
        if not self.mask_heads:
            return dets
        det_boxes = dets.bboxes[..., :4]
        if rescale and scale_factors is not None:
            det_boxes = det_boxes * scale_factors[:, None, :]
        b, m = det_boxes.shape[:2]
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), m)[:, None]
        mask_rois = jnp.concatenate([bidx, det_boxes.reshape(b * m, 4)], 1)
        mask_feats = self._extract(feats, mask_rois)
        if semantic_feat is not None and "mask" in self.semantic_fusion:
            mask_feats = mask_feats + self._semantic_roi(
                semantic_feat, mask_rois, mask_feats.shape[1])
        # average mask probs over stages with info flow (htc_roi_head
        # simple_test_mask: aggregate per-stage preds)
        probs_sum, last_feat = 0.0, None
        for i in range(self.num_stages):
            if self.mask_info_flow:
                logits, last_feat = self.mask_heads[i](mask_feats, last_feat)
            else:
                logits = self.mask_heads[i](mask_feats, return_feat=False)
            probs_sum = probs_sum + jax.nn.sigmoid(logits)
        probs = probs_sum / self.num_stages
        msz = probs.shape[1]
        nc = self.num_classes
        safe_lbl = jnp.clip(dets.labels.reshape(-1), 0, nc - 1)
        masks = jnp.take_along_axis(
            probs, safe_lbl[:, None, None, None], -1)[..., 0]
        return dets, masks.reshape(b, m, msz, msz)

    def _cascade_test_boxes(self, feats, proposals, prop_valid, img_shapes,
                            scale_factors, rescale, semantic_feat):
        """CascadeRoIHead.simple_test with semantic fusion on box feats."""
        from ...core.bbox import delta2bbox
        from ...core.post_processing import multiclass_nms
        cfg = dict(self.test_cfg or {})
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg.get("nms", {}).get("iou_threshold", 0.5))
        max_per_img = int(cfg.get("max_per_img", 100))
        b, p = proposals.shape[:2]
        nc = self.num_classes
        means, stds = self._coder_params(0)

        scores_sum = 0.0
        boxes = proposals
        last_pred = None
        for i in range(self.num_stages):
            bidx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), p)[:, None]
            rois = jnp.concatenate([bidx, boxes.reshape(b * p, 4)], 1)
            roi_feats = self._extract(feats, rois)
            if semantic_feat is not None and "bbox" in self.semantic_fusion:
                roi_feats = roi_feats + self._semantic_roi(
                    semantic_feat, rois, roi_feats.shape[1])
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
