"""LD head — Localization Distillation for GFL (arXiv 2102.12252).

Parity target: mmdet models/dense_heads/ld_head.py:11 (LDHead extends GFLHead
with loss_ld on the positive anchors' DFL corner logits against a teacher's)
and models/detectors/kd_one_stage.py:11
(KnowledgeDistillationSingleStageDetector — frozen teacher forward feeding
soft targets into the student head's loss).

TPU design: the teacher is a flax submodule whose outputs are
stop-gradiented; the whole student+teacher train step stays one jit program
(no separate teacher process/stream). Teacher weights live under
params['teacher_m'] and are loaded from the teacher checkpoint by the engine.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ...utils.registry import DETECTORS, HEADS, LOSSES
from ..detectors.single_stage import SingleStageDetector
from .gfl_head import GFLHead

__all__ = ["LDHead", "KnowledgeDistillationSingleStageDetector"]


@HEADS.register_module()
class LDHead(GFLHead):
    loss_ld: Optional[dict] = None

    def loss(self, cls_outs, reg_outs, batch: Dict[str, Any],
             rng=None) -> Dict[str, jnp.ndarray]:
        losses = super().loss(cls_outs, reg_outs, batch, rng=rng)
        soft = batch.get("soft_targets")
        if soft is None:
            return losses
        b = cls_outs[0].shape[0]
        reg_cat = jnp.concatenate(
            [r.reshape(b, -1, 4 * (self.reg_max + 1)) for r in reg_outs], 1)
        # recompute the positive mask/weights exactly as the GFL loss does
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        anchors, centers, strides, level_sizes = \
            self._anchor_centers_strides(featmap_sizes)
        from .atss_head import atss_assign
        topk = int((self.train_cfg or {}).get("assigner", {}).get("topk", 9))

        def single(gtb, gv):
            assigned = atss_assign(anchors, level_sizes, gtb, gv, topk)
            return assigned > 0

        pos = jax.vmap(single)(batch["gt_bboxes"], batch["gt_valid"])
        cls_cat = jnp.concatenate(
            [c.reshape(b, -1, self.cls_out_channels) for c in cls_outs], 1)
        w = jax.lax.stop_gradient(jax.nn.sigmoid(cls_cat)).max(-1)
        w = jnp.where(pos, w, 0.0)
        ld = LOSSES.build(dict(self.loss_ld or dict(
            type="KnowledgeDistillationKLDivLoss", loss_weight=0.25, T=10)))
        n = reg_cat.shape[1]
        loss_ld = ld(
            reg_cat.reshape(b * n * 4, self.reg_max + 1),
            soft.reshape(b * n * 4, self.reg_max + 1),
            weight=jnp.repeat(w.reshape(-1), 4),
            avg_factor=jnp.maximum(w.sum(), 1e-6) * 4)
        losses["loss_ld"] = loss_ld
        return losses


@DETECTORS.register_module()
class KnowledgeDistillationSingleStageDetector(SingleStageDetector):
    """Student single-stage detector with an in-graph frozen teacher
    (kd_one_stage.py:11). `teacher` is a full detector config; its reg
    outputs become the LD soft targets."""
    teacher: Optional[dict] = None

    def setup(self):
        super().setup()
        from ..builder import build_detector
        assert self.teacher is not None, "teacher config required"
        self.teacher_m = build_detector(dict(self.teacher), None, None)

    def __call__(self, img: jnp.ndarray, train: bool = False):
        feats = self.extract_feat(img, train=train)
        outs = self.bbox_head_m(feats, train=train)
        # touch the teacher so flax creates its params under the standard
        # `init(img)` path; when the result is unused (inference) XLA dead-
        # code-eliminates the teacher compute at compile time.
        self.teacher_m(img, train=False)
        return outs

    def forward_train(self, img: jnp.ndarray, batch: Dict[str, Any]):
        outs = self(img, train=True)
        t_cls, t_reg = self.teacher_m(img, train=False)[:2]
        b = img.shape[0]
        reg_max = self.bbox_head_m.reg_max
        soft = jnp.concatenate(
            [jax.lax.stop_gradient(r).reshape(b, -1, 4 * (reg_max + 1))
             for r in t_reg], 1)
        batch = dict(batch)
        batch["pad_shape"] = (img.shape[1], img.shape[2])
        batch["soft_targets"] = soft
        rng = self.make_rng("sampler") if self.has_rng("sampler") else None
        return self.bbox_head_m.loss(*outs, batch, rng=rng)
