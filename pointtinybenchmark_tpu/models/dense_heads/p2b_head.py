"""P2BNet: point-to-box MIL head (paper-spec, arXiv 2207.06827).

The reference repo hosts P2BNet on a separate git branch that is NOT in
this checkout (SURVEY.md §0 / VERDICT r4 missing #4), so this is a
paper-spec implementation reusing the framework's existing machinery: the
CPR MILLoss family (models/losses/mil_loss.py, reference
multi_instance_learning_loss.py:122-243), multi-level RoIAlign
(models/roi_heads/roi_extractor.py), and the BasicLocator point workflow
(refine_test -> tools/result2ann.py -> train a Faster R-CNN on the pseudo
boxes — the same annotation-refinement pipeline as CPR, SURVEY §3.2).

Two MIL stages, both with static (B, G, P) bag shapes:

- CBP (coarse box prediction): each annotated point gets a bag of
  anchor-like proposals centered ON the point (scales x aspect ratios);
  a Faster-R-CNN-style shared-2FC head scores each proposal with a
  classification branch (sigmoid) and an instance-selection branch
  (softmax over the bag); the bag-level MIL loss pulls the summed
  cls*ins probability toward the gt class. The coarse pseudo box is the
  score-weighted merge of the top-k proposals.
- PBR (precise box refinement, cascadable): the coarse box is jittered
  (scale x center-offset grid) into a refined bag, scored by a separate
  head of the same shape; negative proposals — far-shifted boxes with
  max-IoU < `neg_iou_thr` against EVERY pseudo box in the image — get a
  gfocal negative term pushing their cls prob to 0 (paper eq. 5-7).

Design choices documented as paper-spec defaults (branch not available to
pin): WSDDN-style softmax classification branch — softmax over classes
plus an explicit background column (`with_bg`, default True) so that
background dilution in oversized proposals lowers the object-class
probability and MIL discovers EXTENT, not just presence (with sigmoid
single-class scoring every box containing the object saturates and
nothing selects tight boxes; verified by the learnability test). gfocal
bag/neg losses (reference MILLoss), top-k=4 score-weighted merge.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import HEADS, LOSSES
from ..roi_heads.roi_extractor import single_roi_extract

__all__ = ["P2BNetHead", "SSDDetHead", "cbp_proposals", "pbr_proposals",
           "merge_boxes"]


def cbp_proposals(points: jnp.ndarray, scales: Sequence[float],
                  ratios: Sequence[float]) -> jnp.ndarray:
    """Anchor-like bag proposals centered at each point.

    points (..., 2) -> (..., P, 4) xyxy with P = len(scales)*len(ratios);
    w = s*sqrt(r), h = s/sqrt(r) (so tall boxes come from small r, the
    mmdet AnchorGenerator convention the rest of the framework uses).
    """
    s = np.asarray(scales, np.float32)
    r = np.asarray(ratios, np.float32)
    w = (s[:, None] * np.sqrt(r)[None, :]).reshape(-1)      # (P,)
    h = (s[:, None] / np.sqrt(r)[None, :]).reshape(-1)
    half = jnp.asarray(np.stack([-w, -h, w, h], -1) / 2)    # (P, 4)
    ctr = jnp.concatenate([points, points], -1)             # (..., 4)
    return ctr[..., None, :] + half


def pbr_proposals(boxes: jnp.ndarray, scale_jitter: Sequence[float],
                  offset_frac: Sequence[float]) -> jnp.ndarray:
    """Jittered refinement bag around estimated boxes.

    boxes (..., 4) -> (..., P, 4) with P = len(scale_jitter) *
    len(offset_frac)^2: each output is the input box rescaled about its
    center by `sj` and shifted by (ox*w, oy*h).
    """
    sj = np.asarray(scale_jitter, np.float32)
    of = np.asarray(offset_frac, np.float32)
    ctr = (boxes[..., :2] + boxes[..., 2:]) / 2
    wh = boxes[..., 2:] - boxes[..., :2]
    oxy = np.stack(np.meshgrid(of, of, indexing="ij"),
                   -1).reshape(-1, 2)                       # (O, 2)
    # (S, O, 2) scale and offset grids -> flat (P, 2)
    sc = np.repeat(sj, len(oxy))[:, None]                   # (P, 1)
    off = np.tile(oxy, (len(sj), 1))                        # (P, 2)
    new_wh = wh[..., None, :] * jnp.asarray(sc)
    new_ctr = ctr[..., None, :] + wh[..., None, :] * jnp.asarray(off)
    return jnp.concatenate([new_ctr - new_wh / 2, new_ctr + new_wh / 2], -1)


def merge_boxes(boxes: jnp.ndarray, scores: jnp.ndarray,
                topk: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score-weighted merge of the top-k bag proposals (paper box merging).

    boxes (..., P, 4), scores (..., P) -> ((..., 4), (...,) top score).
    """
    k = min(topk, boxes.shape[-2])
    top_s, top_i = jax.lax.top_k(scores, k)                 # (..., k)
    top_b = jnp.take_along_axis(boxes, top_i[..., None], axis=-2)
    w = top_s / jnp.maximum(top_s.sum(-1, keepdims=True), 1e-12)
    return (top_b * w[..., None]).sum(-2), top_s[..., 0]


@HEADS.register_module()
class P2BNetHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    fc_channels: int = 1024
    roi_size: int = 7
    sampling_ratio: int = 2
    featmap_strides: Sequence[int] = (4, 8, 16, 32)
    finest_scale: float = 56.0
    cbp_scales: Sequence[float] = (8, 16, 32, 64, 128)
    cbp_ratios: Sequence[float] = (1.0 / 3, 0.5, 1.0, 2.0, 3.0)
    pbr_scale_jitter: Sequence[float] = (0.8, 1.0, 1.2)
    pbr_offset_frac: Sequence[float] = (-0.2, 0.0, 0.2)
    pbr_stages: int = 1
    merge_topk: int = 4
    neg_iou_thr: float = 0.3
    # negative candidate grid around the estimate (scale x offset, then
    # filtered at loss time to max-IoU < neg_iou_thr against EVERY pseudo
    # box). Near shifts and over-scales are the paper's extent signal: a
    # shifted oversized box still contains the object but must score
    # background, so "object evidence anywhere -> foreground" stops being
    # a valid solution and MIL is forced onto tight boxes.
    neg_scale_jitter: Sequence[float] = (1.0, 3.0)
    neg_offset: Sequence[float] = (-1.2, -0.6, 0.0, 0.6, 1.2)
    with_bg: bool = True   # background column in the softmax cls branch
    # stage-0 bag source: 'point' (P2BNet CBP — anchor grid on the
    # annotated point) or 'box' (SSD-Det — jitter grid around the NOISY
    # annotated box, spatial self-distillation refinement)
    bag_source: str = "point"
    box_bag_scale_jitter: Sequence[float] = (0.5, 0.7, 1.0, 1.4, 2.0)
    box_bag_offset_frac: Sequence[float] = (-0.3, 0.0, 0.3)
    loss_mil: Optional[dict] = None
    neg_loss_weight: float = 0.75
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    needs_gt_in_forward = True  # plain class attr (not a flax field)

    @property
    def _loss_mil_cfg(self) -> dict:
        return dict(self.loss_mil
                    or dict(type="MILLoss", binary_ins=False,
                            loss_weight=0.25))

    # ---------------------------------------------------------- network
    def _make_stage(self, stage: int):
        """Per-stage parameter scopes (the paper trains CBP and PBR heads
        separately; the PBR head is shared with the negative pass)."""
        shared = [nn.Dense(self.fc_channels, dtype=self.dtype,
                           name=f"stage{stage}_shared_fc{i}")
                  for i in range(2)]
        n_cls_out = self.num_classes + (1 if self.with_bg else 0)
        cls = nn.Dense(n_cls_out, dtype=self.dtype,
                       name=f"stage{stage}_cls")
        ins = nn.Dense(self.num_classes, dtype=self.dtype,
                       name=f"stage{stage}_ins")
        return shared, cls, ins

    def _mil_scores(self, mods, feats, rois_flat):
        """RoIAlign + shared-2FC + (cls, ins) branches.

        rois_flat (R, 5) -> cls/ins logits (R, C)."""
        shared, cls_fc, ins_fc = mods
        x = single_roi_extract(feats, rois_flat,
                               tuple(self.featmap_strides),
                               output_size=self.roi_size,
                               sampling_ratio=self.sampling_ratio,
                               finest_scale=self.finest_scale)
        x = x.astype(self.dtype).reshape(x.shape[0], -1)
        for fc in shared:
            x = nn.relu(fc(x))
        return (cls_fc(x).astype(jnp.float32),
                ins_fc(x).astype(jnp.float32))

    def _cls_prob(self, cls_logits: jnp.ndarray) -> jnp.ndarray:
        """WSDDN-style class probability: softmax over classes (+bg) with
        the bg column dropped — oversized proposals leak mass to bg."""
        if self.with_bg:
            return jax.nn.softmax(cls_logits, axis=-1)[..., :self.num_classes]
        return jax.nn.softmax(cls_logits, axis=-1)

    def _bag_pass(self, mods, feats, boxes, labels):
        """Score a (B, G, P, 4) bag; returns cls/ins (B, G, P, C[+1]/C)
        and the per-proposal selection score for the gt class (B, G, P)."""
        b, g, p, _ = boxes.shape
        bidx = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.float32)[:, None, None], (b, g, p))
        rois = jnp.concatenate([bidx[..., None], boxes],
                               -1).reshape(b * g * p, 5)
        cls, ins = self._mil_scores(mods, feats, rois)
        cls = cls.reshape(b, g, p, -1)
        ins = ins.reshape(b, g, p, -1)
        onehot = jax.nn.one_hot(labels, self.num_classes)    # (B, G, C)
        sel = (self._cls_prob(cls) * jax.nn.softmax(ins, axis=2)
               * onehot[:, :, None, :]).sum(-1)              # (B, G, P)
        return cls, ins, sel

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], batch: Dict[str, Any],
                 train: bool = False, mode: str = "train"):
        """Full P2B computation: CBP bag -> merge -> PBR stage(s).

        batch: gt_points (B, G, R, 2) [R=1, from BasicLocator], gt_labels
        (B, G), gt_valid (B, G). Returns the outputs dict consumed by
        loss() / the P2BNet detector shell.
        """
        del train, mode
        labels = batch["gt_labels"]
        outputs: Dict[str, Any] = {"stages": []}

        if self.bag_source == "box":
            # SSD-Det: the annotation is a NOISY BOX — the stage-0 bag is
            # a scale x offset jitter grid around it
            boxes = pbr_proposals(batch["gt_bboxes"],
                                  self.box_bag_scale_jitter,
                                  self.box_bag_offset_frac)
        else:
            points = batch["gt_points"][:, :, 0, :]          # (B, G, 2)
            boxes = cbp_proposals(points, self.cbp_scales, self.cbp_ratios)
        last_mods = None
        for stage in range(1 + self.pbr_stages):
            last_mods = self._make_stage(stage)
            cls, ins, sel = self._bag_pass(last_mods, feats, boxes, labels)
            merged, top_score = merge_boxes(boxes, sel, self.merge_topk)
            outputs["stages"].append(dict(
                boxes=boxes, cls=cls, ins=ins, sel=sel, merged=merged,
                score=top_score))
            if stage < self.pbr_stages:
                boxes = pbr_proposals(merged, self.pbr_scale_jitter,
                                      self.pbr_offset_frac)

        # negative proposals for the PBR negative loss: a scale x offset
        # grid around the final merged boxes (static-shape stand-in for
        # the paper's random low-IoU sampling), filtered at loss time by
        # max-IoU against every pseudo box in the image
        final = outputs["stages"][-1]["merged"]              # (B, G, 4)
        neg = pbr_proposals(final, tuple(self.neg_scale_jitter),
                            tuple(self.neg_offset))
        bneg, gneg, pneg, _ = neg.shape
        bidx = jnp.broadcast_to(
            jnp.arange(bneg, dtype=jnp.float32)[:, None, None],
            (bneg, gneg, pneg))
        neg_rois = jnp.concatenate([bidx[..., None], neg],
                                   -1).reshape(-1, 5)
        neg_cls, _ = self._mil_scores(last_mods, feats, neg_rois)
        outputs["neg_boxes"] = neg
        outputs["neg_cls"] = neg_cls.reshape(bneg, gneg, pneg, -1)
        outputs["pseudo_boxes"] = final
        outputs["pseudo_scores"] = outputs["stages"][-1]["score"]
        return outputs

    # ---------------------------------------------------------- losses
    def loss(self, outputs: Dict[str, Any], batch: Dict[str, Any],
             rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
        del rng
        mil = LOSSES.build(self._loss_mil_cfg)
        labels = batch["gt_labels"]                          # (B, G)
        valid = batch["gt_valid"]
        b, g = labels.shape

        losses: Dict[str, jnp.ndarray] = {}
        for si, st in enumerate(outputs["stages"]):
            p = st["cls"].shape[2]
            cls_prob = self._cls_prob(st["cls"]).reshape(b * g, p, -1)
            ins = st["ins"].reshape(b * g, p, -1)
            val = jnp.broadcast_to(
                valid.reshape(b * g, 1, 1).astype(jnp.float32), (b * g, p, 1))
            li, acc, _ = mil(cls_prob, ins, labels.reshape(-1), val)
            name = "loss_cbp" if si == 0 else (
                "loss_pbr" if len(outputs["stages"]) == 2
                else f"loss_pbr{si - 1}")
            losses[name] = li
            losses[("bag_acc_cbp" if si == 0 else f"bag_acc{si}")] = acc

        # negative loss: candidates whose max IoU with EVERY valid pseudo
        # box stays below neg_iou_thr are true negatives
        from ...ops.iou import bbox_overlaps
        neg = outputs["neg_boxes"]                           # (B, G, P, 4)
        pseudo = outputs["pseudo_boxes"]                     # (B, G, 4)
        bn, gn, pn, _ = neg.shape
        ious = bbox_overlaps(neg.reshape(bn, gn * pn, 4), pseudo)
        ious = jnp.where(valid[:, None, :], ious, 0.0)       # vs valid gts
        is_neg = (ious.max(-1) < self.neg_iou_thr).reshape(bn, gn, pn)
        neg_w = (is_neg & valid[:, :, None]).astype(jnp.float32)
        # push the object-class probability of negatives to 0 (with_bg:
        # the softmax routes their mass to the background column)
        neg_prob = self._cls_prob(outputs["neg_cls"])        # (B, G, P, C)
        neg_loss = mil.gfocal_loss(
            neg_prob.reshape(-1, self.num_classes),
            jnp.zeros((bn * gn * pn, self.num_classes)),
            neg_w.reshape(-1, 1))
        num_pos = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
        losses["loss_neg"] = (self.neg_loss_weight * neg_loss.sum()
                              / num_pos)
        return losses


@HEADS.register_module()
class SSDDetHead(P2BNetHead):
    """SSD-Det: spatial self-distillation refinement of NOISY BOX
    annotations (paper-spec, arXiv 2307.12101 — like P2BNet, the SSD-Det
    branch is not in this checkout).

    Same MIL machinery as P2BNet with the stage-0 bag built around the
    noisy annotated box instead of a point: the SPSD module's candidate
    bag (scale x offset jitter of the noisy box) is scored by the
    cls x instance-softmax head, the refined box is the top-k
    score-weighted merge, and `pbr_stages` adds further cascaded
    refinement rounds. The refined boxes flow through the same
    refine_test/result2ann workflow to re-train a clean detector.

    The negative grid includes an UNDER-scale (0.4) by default: inset
    boxes (IoU < neg_iou_thr with the estimate) are taught as background,
    giving the symmetric "too small = bg" signal that box-jitter bags
    need (a point bag's smallest scale is bounded away from zero, a
    box-jitter bag's is not)."""
    bag_source: str = "box"
    neg_scale_jitter: Sequence[float] = (0.4, 1.0, 2.5)
