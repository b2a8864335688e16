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
        return self.bbox_head_m.loss(*outs, batch)

    def simple_test(self, img: jnp.ndarray, img_shapes,
                    scale_factors=None, rescale: bool = False):
        outs = self(img, train=False)
        pad_shape = (img.shape[1], img.shape[2])
        return self.bbox_head_m.get_bboxes(*outs, img_shapes, pad_shape,
                                           scale_factors, rescale)


@DETECTORS.register_module()
class BasicLocator(SingleStageDetector):
    """Point-localization shell (CPR / P2P heads). The fork version forwards
    gt_true_bboxes into the head's forward_train (locator.py:20-32); here the
    padded batch dict flows through unchanged, so point heads read whatever
    gt_* keys they need."""
    pass
