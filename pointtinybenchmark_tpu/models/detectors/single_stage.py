"""Single-stage detector shells.

Parity targets:
- SingleStageDetector: mmdet models/detectors/single_stage.py (fork-modified
  to pass gt_* kwargs into head simple_test/aug_test :96-99,129-132).
- BasicLocator: fork models/point/detectors/locator.py:7-32 — a single-stage
  shell for point heads that forwards extra gt tensors into the head.

TPU design: the detector is one flax Module; `__call__` is the jit-compiled
network forward (backbone -> neck -> head). Loss and postprocess are pure
methods on the head, called with the network outputs — so one traced train
step covers the whole model.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import DETECTORS
from ..builder import build_backbone, build_head, build_neck

__all__ = ["SingleStageDetector", "BasicLocator"]


@DETECTORS.register_module()
class SingleStageDetector(nn.Module):
    backbone: dict
    bbox_head: dict
    neck: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    def setup(self):
        self.backbone_m = build_backbone(dict(self.backbone))
        self.neck_m = build_neck(dict(self.neck)) if self.neck else None
        head_cfg = dict(self.bbox_head)
        head_cfg.setdefault("train_cfg", self.train_cfg)
        head_cfg.setdefault("test_cfg", self.test_cfg)
        self.bbox_head_m = build_head(head_cfg)

    def extract_feat(self, img: jnp.ndarray, train: bool = False):
        x = self.backbone_m(img, train=train)
        if self.neck_m is not None:
            x = self.neck_m(x)
        return x

    def __call__(self, img: jnp.ndarray, train: bool = False):
        """Network forward: img (B, H, W, 3) -> raw head outputs."""
        feats = self.extract_feat(img, train=train)
        return self.bbox_head_m(feats, train=train)

    def forward_train(self, img: jnp.ndarray, batch: Dict[str, Any]):
        outs = self(img, train=True)
        # pad_shape is static (the padded batch shape), derived from the
        # image tensor — never a traced value.
        batch = dict(batch)
        batch["pad_shape"] = (img.shape[1], img.shape[2])
        rng = self.make_rng("sampler") if self.has_rng("sampler") else None
        return self.bbox_head_m.loss(*outs, batch, rng=rng)

    def simple_test(self, img: jnp.ndarray, img_shapes,
                    scale_factors=None, rescale: bool = False):
        outs = self(img, train=False)
        pad_shape = (img.shape[1], img.shape[2])
        return self.bbox_head_m.get_bboxes(*outs, img_shapes, pad_shape,
                                           scale_factors, rescale)


@DETECTORS.register_module()
class BasicLocator(SingleStageDetector):
    """Point-localization shell (CPR / P2P heads). The fork version forwards
    gt_true_bboxes into the head's forward_train (locator.py:7-32); here the
    padded batch dict flows through, so point heads read whatever gt_* keys
    they need. Heads that sample features at gt points inside the network
    (CPR) advertise `needs_gt_in_forward` and get the batch in __call__.
    """

    def _head_batch(self, img: jnp.ndarray, batch: Dict[str, Any]) -> Dict[str, Any]:
        gt_bboxes = batch["gt_bboxes"]
        centers = (gt_bboxes[..., :2] + gt_bboxes[..., 2:]) / 2
        hb = dict(batch)
        hb["gt_points"] = centers[:, :, None, :]   # (B, G, R=1, 2)
        hb["pad_shape"] = (img.shape[1], img.shape[2])
        return hb

    def _dummy_batch(self, img: jnp.ndarray) -> Dict[str, Any]:
        b = img.shape[0]
        return dict(
            gt_bboxes=jnp.zeros((b, 1, 4), jnp.float32),
            gt_labels=jnp.zeros((b, 1), jnp.int32),
            gt_valid=jnp.zeros((b, 1), bool),
            img_shape=jnp.tile(
                jnp.asarray([[img.shape[1], img.shape[2]]], jnp.int32), (b, 1)),
        )

    def __call__(self, img: jnp.ndarray, batch: Optional[Dict[str, Any]] = None,
                 train: bool = False, mode: str = "train"):
        feats = self.extract_feat(img, train=train)
        head = self.bbox_head_m
        if getattr(head, "needs_gt_in_forward", False):
            hb = self._head_batch(img, batch if batch is not None
                                  else self._dummy_batch(img))
            return head(feats, hb, train=train, mode=mode)
        return head(feats, train=train)

    def forward_train(self, img: jnp.ndarray, batch: Dict[str, Any]):
        head = self.bbox_head_m
        if getattr(head, "needs_gt_in_forward", False):
            hb = self._head_batch(img, batch)
            outputs = self(img, batch, train=True, mode="train")
            rng = self.make_rng("sampler") if self.has_rng("sampler") else None
            return head.loss(outputs, hb, rng=rng)
        return super().forward_train(img, batch)

    def refine_test(self, img: jnp.ndarray, batch: Dict[str, Any],
                    pseudo_wh=(16, 16)):
        """CPR annotation-refinement inference: refined points + scores +
        pseudo boxes (reference get_bboxes :1231-1283)."""
        head = self.bbox_head_m
        hb = self._head_batch(img, batch)
        if getattr(head, "cascade_stages", 1) > 1:
            refine_pts, scores, not_refine = self(
                img, batch, train=False, mode="cascade_refine")
        else:
            outputs = self(img, batch, train=False, mode="refine")
            refine_pts, scores, not_refine = head.refine(outputs, hb)
        bboxes = head.center_to_pseudo_bbox(refine_pts, pseudo_wh)
        return refine_pts, scores, bboxes, not_refine


@DETECTORS.register_module()
class P2BNet(BasicLocator):
    """Point-to-box MIL detector shell (paper-spec, arXiv 2207.06827 —
    the P2BNet branch is not in this checkout). Same annotation-refinement
    workflow as CPR: `refine_test` emits pseudo boxes joinable back to the
    annotations by tools/result2ann.py, which then train a Faster R-CNN."""

    def refine_test(self, img: jnp.ndarray, batch: Dict[str, Any],
                    pseudo_wh=(16, 16)):
        # pseudo_wh is part of the shared refine_test contract
        # (engine/test.py::run_refine_test); P2B predicts REAL box extents,
        # so the fixed pseudo size is unused.
        del pseudo_wh
        outputs = self(img, batch, train=False, mode="refine")
        boxes = outputs["pseudo_boxes"]
        scores = outputs["pseudo_scores"]
        centers = (boxes[..., :2] + boxes[..., 2:]) / 2
        not_refine = ~batch["gt_valid"]
        return centers, scores, boxes, not_refine


@DETECTORS.register_module()
class SSDDet(P2BNet):
    """SSD-Det shell (noisy-box self-distillation, paper-spec): identical
    refinement workflow to P2BNet — refine_test emits the spatially
    self-distilled boxes for result2ann -> clean-detector retraining."""
    pass


@DETECTORS.register_module()
class RepPointsDetector(SingleStageDetector):
    """RepPoints single-stage shell (mmdet models/detectors/reppoints_detector.py)."""
    pass


@DETECTORS.register_module()
class DETR(SingleStageDetector):
    """DETR shell (mmdet models/detectors/detr.py)."""
    pass


@DETECTORS.register_module()
class YOLOV3(SingleStageDetector):
    """YOLOv3 shell (mmdet models/detectors/yolo.py)."""
    pass


@DETECTORS.register_module()
class SSD(SingleStageDetector):
    """SSD shell."""
    pass


@DETECTORS.register_module()
class CenterNet(SingleStageDetector):
    """CenterNet shell (mmdet models/detectors/centernet.py)."""
    pass


@DETECTORS.register_module()
class FoveaBox(SingleStageDetector):
    """mmdet models/detectors/fovea.py parity (FoveaHead shell)."""


@DETECTORS.register_module()
class VFNet(SingleStageDetector):
    """mmdet models/detectors/vfnet.py parity (VFNetHead shell)."""


@DETECTORS.register_module()
class YOLOF(SingleStageDetector):
    """mmdet models/detectors/yolof.py parity (single-level YOLOFHead)."""


@DETECTORS.register_module()
class AutoAssign(SingleStageDetector):
    """mmdet models/detectors/autoassign.py parity (AutoAssignHead shell)."""


@DETECTORS.register_module()
class DeformableDETR(SingleStageDetector):
    """mmdet models/detectors/deformable_detr.py parity."""


@DETECTORS.register_module()
class CornerNet(SingleStageDetector):
    """mmdet models/detectors/cornernet.py parity (CornerHead shell)."""


@DETECTORS.register_module()
class CentripetalNet(SingleStageDetector):
    """mmdet models/detectors/cornernet.py config variant
    (CentripetalHead shell)."""


@DETECTORS.register_module()
class FSAF(SingleStageDetector):
    """mmdet models/detectors/fsaf.py parity (FSAFHead shell)."""


@DETECTORS.register_module()
class RetinaNet(SingleStageDetector):
    """mmdet models/detectors/retinanet.py parity (RetinaHead shell)."""


@DETECTORS.register_module()
class FCOS(SingleStageDetector):
    """mmdet models/detectors/fcos.py parity (FCOSHead shell)."""


@DETECTORS.register_module()
class ATSS(SingleStageDetector):
    """mmdet models/detectors/atss.py parity (ATSSHead shell)."""


@DETECTORS.register_module()
class GFL(SingleStageDetector):
    """mmdet models/detectors/gfl.py parity (GFLHead shell)."""


@DETECTORS.register_module()
class PAA(SingleStageDetector):
    """mmdet models/detectors/paa.py parity (PAAHead shell)."""


@DETECTORS.register_module()
class NASFCOS(SingleStageDetector):
    """mmdet models/detectors/nasfcos.py parity (NASFCOS_FPN +
    FCOSHead shell)."""
