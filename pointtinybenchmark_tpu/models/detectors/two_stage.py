"""TwoStageDetector — Faster R-CNN family.

Parity target: mmdet models/detectors/two_stage.py (fork-modified: adds
tile_aug_test :196-259 — the tiled path lives in engine/test.py here) and
FasterRCNN (models/detectors/faster_rcnn.py).

TPU design: the whole train step (backbone -> RPN loss -> on-device proposal
NMS -> RoI sampling -> RoI loss) is one traced function; proposals flow
through lax.stop_gradient instead of the reference's .detach().
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import DETECTORS
from ..builder import build_backbone, build_head, build_neck

__all__ = ["TwoStageDetector", "FasterRCNN"]


@DETECTORS.register_module()
class TwoStageDetector(nn.Module):
    backbone: dict
    rpn_head: dict
    roi_head: dict
    neck: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    def setup(self):
        self.backbone_m = build_backbone(dict(self.backbone))
        self.neck_m = build_neck(dict(self.neck)) if self.neck else None
        rpn_cfg = dict(self.rpn_head)
        rpn_cfg.setdefault("train_cfg", (self.train_cfg or {}).get("rpn"))
        rpn_cfg.setdefault("test_cfg", (self.test_cfg or {}).get("rpn"))
        self.rpn_head_m = build_head(rpn_cfg)
        roi_cfg = dict(self.roi_head)
        roi_cfg.setdefault("train_cfg", (self.train_cfg or {}).get("rcnn"))
        roi_cfg.setdefault("test_cfg", (self.test_cfg or {}).get("rcnn"))
        self.roi_head_m = build_head(roi_cfg)

    def extract_feat(self, img: jnp.ndarray, train: bool = False):
        x = self.backbone_m(img, train=train)
        if self.neck_m is not None:
            x = self.neck_m(x)
        return x

    def __call__(self, img: jnp.ndarray, train: bool = False):
        """Full network forward (also initializes every submodule's params):
        backbone -> RPN -> proposals -> RoI head outputs."""
        feats = self.extract_feat(img, train=train)
        rpn_outs = self.rpn_head_m(feats, train=train)
        b = img.shape[0]
        img_shapes = jnp.tile(
            jnp.asarray([[img.shape[1], img.shape[2]]], jnp.int32), (b, 1))
        proposal_cfg = dict((self.test_cfg or {}).get(
            "rpn", dict(nms_pre=1000, max_per_img=1000,
                        nms=dict(iou_threshold=0.7), min_bbox_size=0)))
        proposals, _, prop_valid = self.rpn_head_m.get_proposals(
            *rpn_outs, img_shapes, (img.shape[1], img.shape[2]), proposal_cfg)
        dets = self.roi_head_m.simple_test(feats, proposals, prop_valid,
                                           img_shapes)
        return rpn_outs, dets

    def forward_train(self, img: jnp.ndarray, batch: Dict[str, Any]):
        feats = self.extract_feat(img, train=True)
        batch = dict(batch)
        batch["pad_shape"] = (img.shape[1], img.shape[2])
        return self._forward_train_feats(feats, batch)

    def _forward_train_feats(self, feats, batch: Dict[str, Any]):

        rpn_outs = self.rpn_head_m(feats, train=True)
        # RPN trains class-agnostic: every valid gt is class 0
        rpn_batch = dict(batch)
        rpn_batch["gt_labels"] = jnp.zeros_like(batch["gt_labels"])
        rpn_rng = (self.make_rng("sampler") if self.has_rng("sampler")
                   else jax.random.PRNGKey(1))
        rpn_losses = self.rpn_head_m.loss(*rpn_outs, rpn_batch, rng=rpn_rng)
        rpn_losses = {f"loss_rpn_{k.split('loss_')[-1]}" if k.startswith("loss")
                      else f"rpn_{k}": v for k, v in rpn_losses.items()}

        proposal_cfg = dict((self.train_cfg or {}).get(
            "rpn_proposal", dict(nms_pre=2000, max_per_img=1000,
                                 nms=dict(iou_threshold=0.7),
                                 min_bbox_size=0)))
        proposals, _, prop_valid = self.rpn_head_m.get_proposals(
            *[[jax.lax.stop_gradient(o) for o in outs] for outs in rpn_outs],
            batch["img_shape"], batch["pad_shape"], proposal_cfg)

        rng = self.make_rng("sampler") if self.has_rng("sampler") else \
            jax.random.PRNGKey(0)
        roi_losses = self.roi_head_m.forward_train(
            feats, proposals, prop_valid, batch, rng)
        roi_losses = {k if k.startswith("loss") else f"rcnn_{k}": v
                      for k, v in roi_losses.items()}
        return {**rpn_losses, **roi_losses}

    def simple_test(self, img: jnp.ndarray, img_shapes,
                    scale_factors=None, rescale: bool = False):
        feats = self.extract_feat(img, train=False)
        pad_shape = (img.shape[1], img.shape[2])
        rpn_outs = self.rpn_head_m(feats, train=False)
        proposal_cfg = dict((self.test_cfg or {}).get(
            "rpn", dict(nms_pre=1000, max_per_img=1000,
                        nms=dict(iou_threshold=0.7), min_bbox_size=0)))
        proposals, _, prop_valid = self.rpn_head_m.get_proposals(
            *rpn_outs, img_shapes, pad_shape, proposal_cfg)
        dets = self.roi_head_m.simple_test(feats, proposals, prop_valid,
                                           img_shapes, scale_factors, rescale)
        return dets, None


@DETECTORS.register_module()
class FasterRCNN(TwoStageDetector):
    pass


@DETECTORS.register_module()
class CascadeRCNN(TwoStageDetector):
    """Cascade R-CNN shell (mmdet models/detectors/cascade_rcnn.py)."""
    pass


@DETECTORS.register_module()
class MaskRCNN(TwoStageDetector):
    """Mask R-CNN shell (mmdet models/detectors/mask_rcnn.py) — the mask
    branch lives in StandardRoIHead (mask_head cfg)."""
    pass


@DETECTORS.register_module()
class HybridTaskCascade(TwoStageDetector):
    """HTC shell (mmdet models/detectors/htc.py) — interleaved cascade +
    semantic branch live in HybridTaskCascadeRoIHead."""
    pass


@DETECTORS.register_module()
class SCNet(TwoStageDetector):
    """SCNet shell (mmdet models/detectors/scnet.py) — glbctx/relay live in
    SCNetRoIHead."""
    pass


@DETECTORS.register_module()
class MaskScoringRCNN(TwoStageDetector):
    """MS R-CNN shell (mmdet models/detectors/mask_scoring_rcnn.py)."""
    pass


@DETECTORS.register_module()
class DynamicRCNN(TwoStageDetector):
    """Dynamic R-CNN shell (mmdet models/detectors/faster_rcnn.py config
    variant; adaptive thresholds live in DynamicRoIHead)."""
    pass


@DETECTORS.register_module()
class FastRCNN(nn.Module):
    """Fast R-CNN (mmdet models/detectors/fast_rcnn.py): the second stage
    alone, consuming precomputed proposals. The batch dict carries
    `proposals` (B, P, 4) and optional `proposals_valid` (B, P) — the
    static-shape analog of the reference's per-image proposal lists."""
    backbone: dict
    roi_head: dict
    neck: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    def setup(self):
        self.backbone_m = build_backbone(dict(self.backbone))
        self.neck_m = build_neck(dict(self.neck)) if self.neck else None
        roi_cfg = dict(self.roi_head)
        roi_cfg.setdefault("train_cfg", (self.train_cfg or {}).get(
            "rcnn", self.train_cfg))
        roi_cfg.setdefault("test_cfg", (self.test_cfg or {}).get(
            "rcnn", self.test_cfg))
        self.roi_head_m = build_head(roi_cfg)

    def extract_feat(self, img, train: bool = False):
        x = self.backbone_m(img, train=train)
        if self.neck_m is not None:
            x = self.neck_m(x)
        return x

    def _props(self, batch, b):
        proposals = batch["proposals"]
        valid = batch.get("proposals_valid",
                          jnp.ones(proposals.shape[:2], bool))
        return proposals, valid

    def __call__(self, img: jnp.ndarray, proposals=None,
                 train: bool = False):
        feats = self.extract_feat(img, train=train)
        b = img.shape[0]
        if proposals is None:
            proposals = jnp.zeros((b, 8, 4), jnp.float32)
        img_shapes = jnp.tile(
            jnp.asarray([[img.shape[1], img.shape[2]]], jnp.int32), (b, 1))
        return self.roi_head_m.simple_test(
            feats, proposals, jnp.ones(proposals.shape[:2], bool),
            img_shapes)

    def forward_train(self, img: jnp.ndarray, batch: Dict[str, Any]):
        feats = self.extract_feat(img, train=True)
        batch = dict(batch)
        batch["pad_shape"] = (img.shape[1], img.shape[2])
        proposals, valid = self._props(batch, img.shape[0])
        rng = self.make_rng("sampler") if self.has_rng("sampler") else \
            jax.random.PRNGKey(0)
        losses = self.roi_head_m.forward_train(feats, proposals, valid,
                                               batch, rng)
        return {k if k.startswith("loss") else f"rcnn_{k}": v
                for k, v in losses.items()}

    def simple_test(self, img: jnp.ndarray, img_shapes, proposals=None,
                    proposals_valid=None, scale_factors=None,
                    rescale: bool = False):
        feats = self.extract_feat(img, train=False)
        if proposals_valid is None:
            proposals_valid = jnp.ones(proposals.shape[:2], bool)
        dets = self.roi_head_m.simple_test(feats, proposals,
                                           proposals_valid, img_shapes,
                                           scale_factors, rescale)
        return dets, None


@DETECTORS.register_module()
class RPN(nn.Module):
    """Standalone region-proposal network (mmdet models/detectors/rpn.py):
    trains/evaluates the RPN alone; detections are the class-agnostic
    proposals."""
    backbone: dict
    rpn_head: dict
    neck: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    def setup(self):
        self.backbone_m = build_backbone(dict(self.backbone))
        self.neck_m = build_neck(dict(self.neck)) if self.neck else None
        rpn_cfg = dict(self.rpn_head)
        rpn_cfg.setdefault("train_cfg", (self.train_cfg or {}).get(
            "rpn", self.train_cfg))
        rpn_cfg.setdefault("test_cfg", (self.test_cfg or {}).get(
            "rpn", self.test_cfg))
        self.rpn_head_m = build_head(rpn_cfg)

    def extract_feat(self, img, train: bool = False):
        x = self.backbone_m(img, train=train)
        if self.neck_m is not None:
            x = self.neck_m(x)
        return x

    def __call__(self, img: jnp.ndarray, train: bool = False):
        feats = self.extract_feat(img, train=train)
        return self.rpn_head_m(feats, train=train)

    def forward_train(self, img: jnp.ndarray, batch: Dict[str, Any]):
        feats = self.extract_feat(img, train=True)
        rpn_batch = dict(batch)
        rpn_batch["pad_shape"] = (img.shape[1], img.shape[2])
        rpn_batch["gt_labels"] = jnp.zeros_like(batch["gt_labels"])
        rng = (self.make_rng("sampler") if self.has_rng("sampler")
               else jax.random.PRNGKey(1))
        return self.rpn_head_m.loss(*self.rpn_head_m(feats, train=True),
                                    rpn_batch, rng=rng)

    def simple_test(self, img: jnp.ndarray, img_shapes,
                    scale_factors=None, rescale: bool = False):
        from ...core.post_processing import DetResult
        feats = self.extract_feat(img, train=False)
        outs = self.rpn_head_m(feats, train=False)
        cfg = dict((self.test_cfg or {}).get("rpn", self.test_cfg or {}))
        cfg.setdefault("nms", dict(iou_threshold=0.7))
        proposals, scores, valid = self.rpn_head_m.get_proposals(
            *outs, img_shapes, (img.shape[1], img.shape[2]), cfg)
        if rescale and scale_factors is not None:
            proposals = proposals / scale_factors[:, None, :]
        dets = jnp.concatenate([proposals, scores[..., None]], -1)
        return DetResult(dets, jnp.zeros(scores.shape, jnp.int32),
                         valid), None


@DETECTORS.register_module()
class TridentFasterRCNN(TwoStageDetector):
    """TridentNet (arXiv 1901.01892).

    Parity target: mmdet models/detectors/trident_faster_rcnn.py +
    roi_heads/trident_roi_head.py — at train the three shared-weight
    dilation branches behave as three data copies: branch features are
    concatenated along the batch axis and the gt set is tiled x3 (exactly
    the reference's forward_train); at test a single branch
    (`test_branch_idx`) runs, so inference is the plain two-stage path.
    The reference's TridentRoIHead test-time branch-merge NMS is vacuous
    in single-branch test mode (num_branch=1 at test)."""

    def forward_train(self, img: jnp.ndarray, batch: Dict[str, Any]):
        branches = self.backbone_m(img, train=True)   # tuple of 3 (B,H,W,C)
        n = len(branches)
        x = jnp.concatenate(branches, axis=0)
        feats = (x,)
        if self.neck_m is not None:
            feats = self.neck_m(feats)
        batch = {k: (jnp.concatenate([v] * n, axis=0)
                     if isinstance(v, jnp.ndarray) and v.ndim >= 1
                     and v.shape[0] == img.shape[0] else v)
                 for k, v in batch.items()}
        batch["pad_shape"] = (img.shape[1], img.shape[2])
        return self._forward_train_feats(feats, batch)

    def extract_feat(self, img: jnp.ndarray, train: bool = False):
        x = self.backbone_m(img, train=train)
        if train:  # handled by forward_train
            return x
        if self.neck_m is not None:
            x = self.neck_m(x)
        return x


@DETECTORS.register_module()
class GridRCNN(TwoStageDetector):
    """Grid R-CNN shell (mmdet models/detectors/grid_rcnn.py) — the grid
    branch lives in GridRoIHead."""
    pass


@DETECTORS.register_module()
class PointRend(TwoStageDetector):
    """PointRend shell (mmdet models/detectors/point_rend.py)."""
    pass


@DETECTORS.register_module()
class DoubleHeadRCNN(TwoStageDetector):
    """Double-Head R-CNN shell (mmdet models/detectors/double_head_rcnn
    via config) — DoubleConvFCBBoxHead in a StandardRoIHead."""
    pass


@DETECTORS.register_module()
class DetectoRS(TwoStageDetector):
    """DetectoRS shell — DetectoRS_ResNet(SAC) backbone + RFP neck over a
    Faster/Cascade R-CNN (mmdet uses CascadeRCNN with those components)."""
    pass
