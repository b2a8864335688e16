"""FSAFHead — anchor-free branch with online feature-level selection.

Parity target: mmdet models/dense_heads/fsaf_head.py — each gt trains at
exactly one pyramid level, chosen ONLINE as the level whose effective
region currently yields the lowest (focal + IoU) loss; positives are the
0.2-shrunk effective region, the 0.5-shrunk ignore region contributes no
negative gradient; TBLR regression normalized by 4·stride.

TPU design: the per-gt per-level candidate losses form one (L, N, G)
masked tensor; level selection is an argmin over the level axis — the
reference's per-gt python loop disappears. Single-anchor-free-branch
variant (the paper's combined anchor+free model is the RetinaHead config
composition).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.bbox import bbox2tblr, tblr2bbox
from ...core.post_processing import DetResult, multiclass_nms
from ...ops.iou import bbox_overlaps_aligned
from ...utils.registry import HEADS, LOSSES
from ...ops.gather import take_rows
from ..utils import ConvModule, bias_init_with_prob

__all__ = ["FSAFHead"]

BIG = 1e8


@HEADS.register_module()
class FSAFHead(nn.Module):
    num_classes: int
    in_channels: int
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    pos_scale: float = 0.2     # effective region shrink
    ignore_scale: float = 0.5  # ignore region shrink
    norm_cfg: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        norm = (self.norm_cfg or {}).get("type")
        ngroups = (self.norm_cfg or {}).get("num_groups", 32)
        cls_convs = [ConvModule(self.feat_channels, 3, norm=norm,
                                num_groups=ngroups, dtype=self.dtype,
                                name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [ConvModule(self.feat_channels, 3, norm=norm,
                                num_groups=ngroups, dtype=self.dtype,
                                name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=1,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(
                               bias_init_with_prob(0.01)),
                           dtype=self.dtype, name="conv_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name="conv_reg")
        cls_outs, reg_outs = [], []
        for f in feats:
            cf, rf = f, f
            for conv in cls_convs:
                cf = conv(cf, train=train)
            for conv in reg_convs:
                rf = conv(rf, train=train)
            cls_outs.append(conv_cls(cf))
            # relu keeps TBLR distances positive (fsaf uses exp/relu variants)
            reg_outs.append(nn.relu(conv_reg(rf)) + 1e-4)
        return cls_outs, reg_outs

    def flat_points(self, featmap_sizes):
        pts, strides, lvl = [], [], []
        for li, ((h, w), s) in enumerate(zip(featmap_sizes, self.strides)):
            xs = (np.arange(w) * s + s / 2).astype(np.float32)
            ys = (np.arange(h) * s + s / 2).astype(np.float32)
            xx, yy = np.meshgrid(xs, ys)
            p = np.stack([xx.ravel(), yy.ravel()], -1)
            pts.append(p)
            strides.append(np.full((len(p),), s, np.float32))
            lvl.append(np.full((len(p),), li, np.int32))
        return (np.concatenate(pts), np.concatenate(strides),
                np.concatenate(lvl))

    @staticmethod
    def _region_mask(pts, gtb, scale):
        cx = (gtb[:, 0] + gtb[:, 2]) / 2
        cy = (gtb[:, 1] + gtb[:, 3]) / 2
        hw = (gtb[:, 2] - gtb[:, 0]) * scale / 2
        hh = (gtb[:, 3] - gtb[:, 1]) * scale / 2
        return ((pts[:, None, 0] >= cx[None] - hw[None])
                & (pts[:, None, 0] <= cx[None] + hw[None])
                & (pts[:, None, 1] >= cy[None] - hh[None])
                & (pts[:, None, 1] <= cy[None] + hh[None]))

    def loss(self, cls_outs, reg_outs, batch: Dict[str, Any], rng=None):
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        points, strides, lvl_id = self.flat_points(featmap_sizes)
        pts = jnp.asarray(points)
        st = jnp.asarray(strides)
        lid = jnp.asarray(lvl_id)
        nl = len(self.strides)
        b = cls_outs[0].shape[0]
        cls_cat = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes) for c in cls_outs], 1)
        reg_cat = jnp.concatenate([r.reshape(b, -1, 4) for r in reg_outs], 1)

        def single(cls_s, reg_s, gtb, gtl, gv):
            n = pts.shape[0]
            g = gtb.shape[0]
            eff = self._region_mask(pts, gtb, self.pos_scale) \
                & gv[None, :]                                   # (N, G)
            ign = self._region_mask(pts, gtb, self.ignore_scale) \
                & gv[None, :]
            # candidate losses per (point, gt): focal + IoU of decoded TBLR
            p = jax.lax.stop_gradient(jax.nn.sigmoid(cls_s))
            safe_l = jnp.clip(gtl, 0, self.num_classes - 1)
            p_gt = p[:, safe_l]                                 # (N, G)
            cls_l = -0.25 * (1 - p_gt) ** 2 * jnp.log(p_gt + 1e-8)
            prior = jnp.stack([pts[:, 0] - st / 2, pts[:, 1] - st / 2,
                               pts[:, 0] + st / 2, pts[:, 1] + st / 2], -1)
            # TBLR preds are in 4*stride units: scale by stride on decode
            dec = tblr2bbox(prior,
                            jax.lax.stop_gradient(reg_s) * st[:, None],
                            normalizer=4.0, normalize_by_wh=False)
            from ...ops.iou import bbox_overlaps
            iou_ng = bbox_overlaps(dec, gtb)
            cand_l = cls_l + (1.0 - iou_ng)
            # per-gt per-level mean candidate loss over the effective region
            lvl_loss = []
            for li in range(nl):
                m = eff & (lid == li)[:, None]
                cnt = jnp.maximum(m.sum(0), 1)
                lvl_loss.append((cand_l * m).sum(0) / cnt
                                + jnp.where(m.any(0), 0.0, BIG))
            lvl_loss = jnp.stack(lvl_loss)                      # (L, G)
            best = jnp.argmin(lvl_loss, 0)                      # (G,)
            sel = eff & (lid[:, None] == best[None, :])         # (N, G)
            # points claimed by several gts -> smallest area
            area = (gtb[:, 2] - gtb[:, 0]) * (gtb[:, 3] - gtb[:, 1])
            am = jnp.where(sel, area[None, :], BIG)
            gt_idx = jnp.argmin(am, 1)
            pos = jnp.min(am, 1) < BIG
            labels = jnp.where(pos, gtl[gt_idx], self.num_classes)
            # ignore: inside any 0.5-region (selected level) but not pos
            ign_any = (ign & (lid[:, None] == best[None, :])).any(1)
            cls_w = jnp.where(~pos & ign_any, 0.0, 1.0)
            # TBLR target on the stride-square prior, normalized by 4*stride
            tgt = bbox2tblr(prior, gtb[gt_idx], normalizer=4.0,
                            normalize_by_wh=False) / st[:, None]
            return labels, cls_w, pos, tgt, prior, gt_idx

        labels, cls_w, pos, tgt, prior, gt_idx = jax.vmap(
            single, in_axes=(0, 0, 0, 0, 0))(
            cls_cat, reg_cat, batch["gt_bboxes"], batch["gt_labels"],
            batch["gt_valid"])
        pos_f = pos.astype(jnp.float32)
        num_pos = jnp.maximum(pos_f.sum(), 1.0)
        loss_cls_fn = LOSSES.build(dict(
            self.loss_cls or dict(type="FocalLoss", use_sigmoid=True,
                                  gamma=2.0, alpha=0.25, loss_weight=1.0)))
        loss_cls = loss_cls_fn(cls_cat.reshape(-1, self.num_classes),
                               labels.reshape(-1),
                               weight=cls_w.reshape(-1), avg_factor=num_pos)
        # IoU loss on decoded boxes at positives
        st_b = jnp.asarray(strides)[None, :, None]
        dec = tblr2bbox(prior.reshape(-1, 4),
                        (reg_cat * st_b).reshape(-1, 4),
                        normalizer=4.0, normalize_by_wh=False)
        gtb_sel = take_rows(batch["gt_bboxes"], gt_idx)
        ious = bbox_overlaps_aligned(dec.reshape(pos.shape + (4,)), gtb_sel)
        loss_bbox = ((1.0 - ious) * pos_f).sum() / num_pos
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "num_pos": pos_f.sum()}

    def get_bboxes(self, cls_outs, reg_outs, img_shapes, pad_shape,
                   scale_factors=None, rescale: bool = False) -> DetResult:
        cfg = self.test_cfg or {}
        nms_pre = int(cfg.get("nms_pre", 1000))
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg.get("nms", {}).get("iou_threshold", 0.5))
        max_per_img = int(cfg.get("max_per_img", 100))
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        b = cls_outs[0].shape[0]
        lvl_pts = []
        for (h, w), s in zip(featmap_sizes, self.strides):
            xs = (np.arange(w) * s + s / 2).astype(np.float32)
            ys = (np.arange(h) * s + s / 2).astype(np.float32)
            xx, yy = np.meshgrid(xs, ys)
            lvl_pts.append((np.stack([xx.ravel(), yy.ravel()], -1), s))
        cls_l = [c.reshape(b, -1, self.num_classes) for c in cls_outs]
        reg_l = [r.reshape(b, -1, 4) for r in reg_outs]

        def single(cls_list, reg_list, img_shape, scale_factor):
            boxes_all, scores_all = [], []
            for lvl in range(len(cls_list)):
                sc = jax.nn.sigmoid(cls_list[lvl])
                rank = jnp.max(sc, -1)
                k = min(nms_pre, sc.shape[0]) if nms_pre > 0 else sc.shape[0]
                _, idx = jax.lax.top_k(rank, k)
                p, s = lvl_pts[lvl]
                pj = jnp.asarray(p)[idx]
                prior = jnp.stack([pj[:, 0] - s / 2, pj[:, 1] - s / 2,
                                   pj[:, 0] + s / 2, pj[:, 1] + s / 2], -1)
                boxes = tblr2bbox(prior, reg_list[lvl][idx] * s,
                                  normalizer=4.0, normalize_by_wh=False)
                boxes = jnp.stack([
                    jnp.clip(boxes[:, 0], 0, img_shape[1]),
                    jnp.clip(boxes[:, 1], 0, img_shape[0]),
                    jnp.clip(boxes[:, 2], 0, img_shape[1]),
                    jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
                boxes_all.append(boxes)
                scores_all.append(sc[idx])
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            if rescale and scale_factor is not None:
                boxes = boxes / scale_factor
            scores = jnp.concatenate(
                [scores, jnp.zeros((scores.shape[0], 1))], -1)
            return multiclass_nms(boxes, scores, score_thr, iou_thr,
                                  max_per_img)

        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        dets = jax.vmap(single)(cls_l, reg_l, img_shapes, sf)
        return dets, None
