"""AnchorHead — anchor-based dense head base (RetinaNet/RPN family).

Parity target: mmdet models/dense_heads/anchor_head.py:745 — multi-level
anchor grids, MaxIoU assignment, delta-coded regression, per-level topk +
multiclass NMS inference.

TPU design: anchors for all levels are trace-time numpy constants
concatenated to one (N, 4) array; target assignment is one vmapped batched
pass (the reference loops images on host, images_to_levels etc.); losses are
computed over the flat (B, N) layout with masks — no unmap/split machinery.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.anchors import AnchorGenerator
from ...core.assigners import MaxIoUAssigner
from ...core.bbox import bbox2delta, delta2bbox
from ...core.post_processing import DetResult, multiclass_nms
from ...ops.gather import take_rows
from ...utils.registry import HEADS, LOSSES
from ..utils import bias_init_with_prob

__all__ = ["AnchorHead"]


@HEADS.register_module()
class AnchorHead(nn.Module):
    num_classes: int
    in_channels: int
    feat_channels: int = 256
    anchor_generator: Optional[dict] = None
    bbox_coder: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @property
    def use_sigmoid_cls(self) -> bool:
        lc = self.loss_cls or dict(type="CrossEntropyLoss", use_sigmoid=True)
        return bool(lc.get("use_sigmoid", False))

    @property
    def cls_out_channels(self) -> int:
        return self.num_classes if self.use_sigmoid_cls else self.num_classes + 1

    @property
    def sampling(self) -> bool:
        """mmdet: sampling unless the cls loss is Focal/GHM (then all
        anchors contribute, normalized by num_pos)."""
        lc = (self.loss_cls or {}).get("type", "CrossEntropyLoss")
        return lc not in ("FocalLoss", "GHMC", "QualityFocalLoss")

    def _build_generator(self):
        cfg = dict(self.anchor_generator or dict(
            type="AnchorGenerator", scales=[8], ratios=[0.5, 1.0, 2.0],
            strides=[4, 8, 16, 32, 64]))
        gen_type = cfg.pop("type", "AnchorGenerator")
        from ...core import anchors as _anchors
        cls = getattr(_anchors, gen_type, AnchorGenerator)
        return cls(**cfg)

    @property
    def num_base_anchors(self) -> int:
        return self._build_generator().num_base_anchors[0]

    def _coder_params(self):
        cfg = dict(self.bbox_coder or {})
        return (tuple(cfg.get("target_means", (0., 0., 0., 0.))),
                tuple(cfg.get("target_stds", (1., 1., 1., 1.))))

    def _coder_fns(self):
        """(encode, decode) honoring LegacyDeltaXYWHBBoxCoder configs."""
        from ...core.bbox import delta_coder_fns
        return delta_coder_fns(self.bbox_coder)

    # ------------------------------------------------------------- network
    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        conv_cls = nn.Conv(self.num_base_anchors * self.cls_out_channels,
                           (1, 1), dtype=self.dtype, name="conv_cls",
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(
                               bias_init_with_prob(0.01)
                               if self.use_sigmoid_cls else 0.0))
        conv_reg = nn.Conv(self.num_base_anchors * 4, (1, 1),
                           kernel_init=nn.initializers.normal(0.01),
                           dtype=self.dtype, name="conv_reg")
        return ([conv_cls(f) for f in feats], [conv_reg(f) for f in feats])

    # ----------------------------------------------------------- anchors
    def flat_anchors(self, featmap_sizes: Sequence[Tuple[int, int]],
                     pad_shape) -> Tuple[np.ndarray, np.ndarray]:
        gen = self._build_generator()
        anchors = np.concatenate(
            [np.asarray(a) for a in gen.grid_anchors(featmap_sizes)])
        valid = np.concatenate(
            [np.asarray(v) for v in gen.valid_flags(featmap_sizes, pad_shape)])
        allowed_border = int((self.train_cfg or {}).get("allowed_border", 0))
        if allowed_border >= 0:
            inside = ((anchors[:, 0] >= -allowed_border)
                      & (anchors[:, 1] >= -allowed_border)
                      & (anchors[:, 2] < pad_shape[1] + allowed_border)
                      & (anchors[:, 3] < pad_shape[0] + allowed_border))
            valid = valid & inside
        return anchors.astype(np.float32), valid

    def _flatten_preds(self, cls_outs, bbox_outs):
        b = cls_outs[0].shape[0]
        cls_cat = jnp.concatenate(
            [c.reshape(b, -1, self.cls_out_channels) for c in cls_outs], 1)
        box_cat = jnp.concatenate(
            [r.reshape(b, -1, 4) for r in bbox_outs], 1)
        return cls_cat, box_cat

    # ------------------------------------------------------------- targets
    def build_assigner(self) -> MaxIoUAssigner:
        cfg = dict(self.train_cfg["assigner"])
        cfg.pop("type", None)
        return MaxIoUAssigner(**cfg)

    def get_targets(self, anchors: np.ndarray, anchor_valid: np.ndarray,
                    batch: Dict[str, jnp.ndarray],
                    return_gt_ids: bool = False):
        """Batched target assignment. Returns labels (B, N),
        label_weights (B, N), bbox_targets (B, N, 4), bbox_weights (B, N)
        [+ assigned gt indices (B, N), 0-based, only meaningful at
        positives, when return_gt_ids]."""
        assigner = self.build_assigner()
        means, stds = self._coder_params()
        encode_fn, _ = self._coder_fns()
        pos_weight = float((self.train_cfg or {}).get("pos_weight", -1))

        def single(gt_bboxes, gt_labels, gt_valid, gt_ignore, gt_ig_valid):
            assigned, max_ov, labels = assigner.assign(
                jnp.asarray(anchors), gt_bboxes, gt_valid, gt_labels,
                gt_bboxes_ignore=gt_ignore, gt_ignore_valid=gt_ig_valid,
                bbox_valid=jnp.asarray(anchor_valid))
            pos = assigned > 0
            neg = assigned == 0
            safe = jnp.clip(assigned - 1, 0, gt_bboxes.shape[0] - 1)
            tgt_boxes = take_rows(gt_bboxes, safe)
            bbox_targets = encode_fn(jnp.asarray(anchors), tgt_boxes,
                                     means, stds)
            bbox_targets = jnp.where(pos[:, None], bbox_targets, 0.0)
            out_labels = jnp.where(pos, labels, self.num_classes)
            lw_pos = 1.0 if pos_weight <= 0 else pos_weight
            label_weights = (pos.astype(jnp.float32) * lw_pos
                             + neg.astype(jnp.float32))
            if return_gt_ids:
                return (out_labels, label_weights, bbox_targets,
                        pos.astype(jnp.float32), safe.astype(jnp.int32))
            return (out_labels, label_weights, bbox_targets,
                    pos.astype(jnp.float32))

        gt_ignore = batch.get("gt_bboxes_ignore")
        gt_ig_valid = batch.get("gt_ignore_valid")
        if gt_ignore is None:
            b = batch["gt_bboxes"].shape[0]
            gt_ignore = jnp.zeros((b, 1, 4), jnp.float32)
            gt_ig_valid = jnp.zeros((b, 1), bool)
        return jax.vmap(single)(batch["gt_bboxes"], batch["gt_labels"],
                                batch["gt_valid"], gt_ignore, gt_ig_valid)

    # ---------------------------------------------------------------- loss
    def loss(self, cls_outs, bbox_outs, batch: Dict[str, Any],
             rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        pad_shape = batch["pad_shape"]
        anchors, anchor_valid = self.flat_anchors(featmap_sizes, pad_shape)
        cls_cat, box_cat = self._flatten_preds(cls_outs, bbox_outs)
        b, n = cls_cat.shape[:2]

        labels, label_weights, bbox_targets, pos_mask = self.get_targets(
            anchors, anchor_valid, batch)

        # sampling losses (RPN CE): apply the RandomSampler budgets
        # (reference: 256 anchors @ pos_fraction 0.5 — see
        # faster_rcnn config train_cfg.rpn.sampler). Focal-style heads keep
        # every anchor (sampling=False).
        if self.sampling and (self.train_cfg or {}).get("sampler"):
            from ...core.samplers import RandomSampler
            scfg = dict(self.train_cfg["sampler"])
            sampler = RandomSampler(
                num=int(scfg.get("num", 256)),
                pos_fraction=float(scfg.get("pos_fraction", 0.5)),
                neg_pos_ub=int(scfg.get("neg_pos_ub", -1)))
            if rng is None:
                rng = jax.random.PRNGKey(0)
            keys = jax.random.split(rng, b)

            def sample_one(key, lbls, lw, pos):
                assigned = jnp.where(pos > 0, 1, jnp.where(lw > 0, 0, -1))
                res = sampler.sample(key, assigned, lbls)
                keep = res.pos_mask | res.neg_mask
                return (lw * keep.astype(jnp.float32),
                        pos * res.pos_mask.astype(jnp.float32))

            label_weights, pos_mask = jax.vmap(sample_one)(
                keys, labels, label_weights, pos_mask)

        # reference normalization (anchor_head.py get_targets): each image
        # contributes max(num_pos_i, 1) — an empty-gt image still adds 1.
        pos_per_img = pos_mask.sum(axis=1)
        num_pos = jnp.maximum(pos_per_img, 1.0).sum()
        if self.sampling:
            neg_per_img = (label_weights > 0).sum(axis=1) - pos_per_img
            num_total = num_pos + jnp.maximum(neg_per_img, 1.0).sum()
        else:
            num_total = num_pos

        loss_cls_fn = LOSSES.build(dict(self.loss_cls))
        loss_bbox_fn = LOSSES.build(dict(self.loss_bbox))
        loss_cls = loss_cls_fn(cls_cat.reshape(b * n, -1),
                               labels.reshape(-1),
                               weight=label_weights.reshape(-1),
                               avg_factor=num_total)
        loss_bbox = loss_bbox_fn(box_cat, bbox_targets,
                                 weight=pos_mask[..., None],
                                 avg_factor=num_total)
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "num_pos": num_pos}

    # ------------------------------------------------------------ inference
    def get_bboxes(self, cls_outs, bbox_outs, img_shapes, pad_shape,
                   scale_factors=None, rescale: bool = False,
                   factor_outs=None) -> DetResult:
        """factor_outs: optional per-level (B, H, W, A) centerness/objectness
        logits; sigmoid'd and applied per the reference score_factors
        contract — ranking and output scores use the product, the score
        threshold gates the raw cls score (bbox_nms.py:55-62)."""
        cfg = self.test_cfg or {}
        nms_pre = int(cfg.get("nms_pre", 1000))
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg.get("nms", {}).get("iou_threshold", 0.5))
        max_per_img = int(cfg.get("max_per_img", 100))
        means, stds = self._coder_params()
        _, decode_fn = self._coder_fns()

        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        gen = self._build_generator()
        level_anchors = [np.asarray(a).astype(np.float32)
                         for a in gen.grid_anchors(featmap_sizes)]
        b = cls_outs[0].shape[0]

        def single(cls_list, box_list, fac_list, img_shape, scale_factor):
            pts, scs, fcs = [], [], []
            for lvl, (cls_o, box_o) in enumerate(zip(cls_list, box_list)):
                sc = (jax.nn.sigmoid(cls_o) if self.use_sigmoid_cls
                      else jax.nn.softmax(cls_o, -1))
                fac = (jax.nn.sigmoid(fac_list[lvl])
                       if fac_list is not None else None)
                if self.use_sigmoid_cls:
                    max_s = jnp.max(sc, -1)
                else:
                    max_s = jnp.max(sc[:, :-1], -1)
                if fac is not None:
                    max_s = max_s * fac
                k = min(nms_pre, sc.shape[0]) if nms_pre > 0 else sc.shape[0]
                _, idx = jax.lax.top_k(max_s, k)
                boxes = decode_fn(jnp.asarray(level_anchors[lvl])[idx],
                                  box_o[idx], means, stds)
                boxes = jnp.stack([
                    jnp.clip(boxes[:, 0], 0, img_shape[1]),
                    jnp.clip(boxes[:, 1], 0, img_shape[0]),
                    jnp.clip(boxes[:, 2], 0, img_shape[1]),
                    jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
                pts.append(boxes)
                scs.append(sc[idx])
                if fac is not None:
                    fcs.append(fac[idx])
            boxes = jnp.concatenate(pts)
            scores = jnp.concatenate(scs)
            factors = jnp.concatenate(fcs) if fcs else None
            if rescale and scale_factor is not None:
                boxes = boxes / scale_factor
            if self.use_sigmoid_cls:
                scores = jnp.concatenate(
                    [scores, jnp.zeros((scores.shape[0], 1))], -1)
            return multiclass_nms(boxes, scores, score_thr, iou_thr,
                                  max_per_img, score_factors=factors)

        # reshape level outputs to (B, HWA, C)
        cls_levels = [c.reshape(b, -1, self.cls_out_channels)
                      for c in cls_outs]
        box_levels = [r.reshape(b, -1, 4) for r in bbox_outs]
        fac_levels = ([f.reshape(b, -1) for f in factor_outs]
                      if factor_outs is not None else None)
        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        if fac_levels is None:
            dets = jax.vmap(lambda c, x, i, s: single(c, x, None, i, s))(
                cls_levels, box_levels, img_shapes, sf)
        else:
            dets = jax.vmap(single)(cls_levels, box_levels, fac_levels,
                                    img_shapes, sf)
        return dets, None
