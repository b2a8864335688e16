"""Guided Anchoring heads — GuidedAnchorHead (GA-RPN flavor), GARetinaHead.

Parity targets:
- mmdet models/dense_heads/guided_anchor_head.py:59 (GuidedAnchorHead):
  loc branch (objectness map, focal loss over center/ignore/negative
  regions, ga_loc_targets :374), shape branch (per-position (dw, dh) trained
  with BoundedIoULoss against ApproxMaxIoU-assigned gts, :476-605), feature
  adaption (DCN whose offsets come from the shape prediction, :14-56), and
  cls/reg branches run on *guided anchors* (squares grown by the predicted
  shape, :289-373).
- mmdet models/dense_heads/ga_retina_head.py:10 (GARetinaHead): 4 stacked
  convs, separate cls/reg feature adaption, 3x3 output convs.

TPU redesign notes:
- MaskedConv2d is a CUDA sparse-compute trick (skip conv at loc-filtered
  positions, guided_anchor_head.py:223-234 "masked conv is only used during
  inference for speed-up"). Dense conv is faster on the MXU, so we always run
  dense and apply the loc filter to *scores* at decode time — same outputs.
- Anchor filtering `squares[mask]` is dynamic-shape; we keep all positions
  (static N) and zero out filtered scores instead.
- ga_loc_targets paints per-gt rectangles serially on host; here each level's
  (H, W) map is a broadcast membership test over the padded gt set, vmapped
  over the batch. Paint priority is deterministic: center > ignore >
  negative (the reference's serial paint is gt-order-dependent when regions
  of different gts overlap).
- The reference feeds loc_target=1 (centers) to a 1-logit FocalLoss whose
  0-based label convention makes label 1 the background bucket; we encode
  centers as label 0 (the foreground channel) so the loc map trains toward
  sigmoid -> 1 at centers, which is what the paper and the `loc_pred.sigmoid()
  >= loc_filter_thr` inference filter require.
- FeatureAdaption's DeformConv2d becomes an unfold-by-bilinear-gather (9
  taps x deform groups) followed by a 1x1 conv — one big MXU matmul.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.anchors import AnchorGenerator
from ...core.assigners import MaxIoUAssigner
from ...core.bbox import bbox2delta, delta2bbox
from ...core.post_processing import DetResult, multiclass_nms
from ...ops.grid_sample import point_sample_pixel
from ...ops.iou import bbox_overlaps
from ...utils.registry import HEADS, LOSSES
from ...ops.gather import take_rows
from ..utils import ConvModule, bias_init_with_prob

__all__ = ["FeatureAdaption", "GuidedAnchorHead", "GARetinaHead",
           "GARPNHead"]


class FeatureAdaption(nn.Module):
    """DCN-v1 whose offsets are predicted from the (detached) shape branch
    (guided_anchor_head.py:14-56). Implemented as bilinear unfold + 1x1 conv."""
    out_channels: int
    kernel_size: int = 3
    deform_groups: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, shape_pred: jnp.ndarray) -> jnp.ndarray:
        k, dg = self.kernel_size, self.deform_groups
        kk = k * k
        off = nn.Conv(dg * kk * 2, (1, 1), use_bias=False,
                      kernel_init=nn.initializers.normal(0.1),
                      dtype=self.dtype, name="conv_offset")(
                          jax.lax.stop_gradient(shape_pred))
        b, h, w, c = x.shape
        cpg = c // dg
        r = k // 2
        base = np.stack(np.meshgrid(np.arange(-r, r + 1),
                                    np.arange(-r, r + 1), indexing="ij"),
                        -1).reshape(kk, 2).astype(np.float32)  # (kk, [dy,dx])
        off = off.reshape(b, h, w, dg, kk, 2)
        gy = jnp.arange(h, dtype=x.dtype)[None, :, None, None]
        gx = jnp.arange(w, dtype=x.dtype)[None, None, :, None]
        cols = []
        for g in range(dg):
            py = gy + base[None, None, None, :, 0] + off[..., g, :, 0]
            px = gx + base[None, None, None, :, 1] + off[..., g, :, 1]
            pts = jnp.stack([px, py], -1).reshape(b, h * w * kk, 2)
            s = point_sample_pixel(x[..., g * cpg:(g + 1) * cpg], pts,
                                   padding_mode="zeros")
            cols.append(s.reshape(b, h, w, kk, cpg))
        unfolded = jnp.concatenate(cols, -1).reshape(b, h, w, kk * c)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype, name="conv_adaption")(unfolded)
        return nn.relu(y)


@HEADS.register_module()
class GuidedAnchorHead(nn.Module):
    num_classes: int = 1
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4          # used by GARetinaHead
    approx_anchor_generator: Optional[dict] = None
    square_anchor_generator: Optional[dict] = None
    anchor_coder: Optional[dict] = None
    bbox_coder: Optional[dict] = None
    deform_groups: int = 4
    loc_filter_thr: float = 0.01
    loss_loc: Optional[dict] = None
    loss_shape: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    # ------------------------------------------------------------ config
    @property
    def use_sigmoid_cls(self) -> bool:
        lc = self.loss_cls or dict(type="CrossEntropyLoss", use_sigmoid=True)
        return bool(lc.get("use_sigmoid", False))

    @property
    def cls_out_channels(self) -> int:
        return self.num_classes if self.use_sigmoid_cls else self.num_classes + 1

    @property
    def sampling(self) -> bool:
        lc = (self.loss_cls or {}).get("type", "CrossEntropyLoss")
        return lc not in ("FocalLoss", "GHMC", "QualityFocalLoss")

    def _approx_gen(self) -> AnchorGenerator:
        cfg = dict(self.approx_anchor_generator or dict(
            octave_base_scale=8, scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
            strides=[4, 8, 16, 32, 64]))
        cfg.pop("type", None)
        return AnchorGenerator(**cfg)

    def _square_gen(self) -> AnchorGenerator:
        cfg = dict(self.square_anchor_generator or dict(
            ratios=[1.0], scales=[8], strides=[4, 8, 16, 32, 64]))
        cfg.pop("type", None)
        return AnchorGenerator(**cfg)

    def _coder_params(self, which: str):
        cfg = dict((getattr(self, which) or {}))
        return (tuple(cfg.get("target_means", (0., 0., 0., 0.))),
                tuple(cfg.get("target_stds", (1., 1., 1., 1.))))

    # ------------------------------------------------------------ network
    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        conv_loc = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv_loc",
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(
                               bias_init_with_prob(0.01)))
        conv_shape = nn.Conv(2, (1, 1), dtype=self.dtype, name="conv_shape",
                             kernel_init=nn.initializers.normal(0.01))
        adaption = FeatureAdaption(self.feat_channels,
                                   deform_groups=self.deform_groups,
                                   dtype=self.dtype, name="feature_adaption")
        conv_cls = nn.Conv(self.cls_out_channels, (1, 1), dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name="conv_cls")
        conv_reg = nn.Conv(4, (1, 1), dtype=self.dtype, name="conv_reg",
                           kernel_init=nn.initializers.normal(0.01))
        cls_outs, reg_outs, shape_outs, loc_outs = [], [], [], []
        for f in feats:
            loc = conv_loc(f)
            shp = conv_shape(f)
            xa = adaption(f, shp)
            cls_outs.append(conv_cls(xa))
            reg_outs.append(conv_reg(xa))
            shape_outs.append(shp)
            loc_outs.append(loc)
        return cls_outs, reg_outs, shape_outs, loc_outs

    # ------------------------------------------------------- loc targets
    def ga_loc_targets(self, batch: Dict[str, Any], featmap_sizes):
        """Flat (B, N) loc labels (0 = center/fg, 1 = bg) and weights.
        Vectorized ga_loc_targets (guided_anchor_head.py:374-475)."""
        tc = self.train_cfg or {}
        center_ratio = float(tc.get("center_ratio", 0.2))
        ignore_ratio = float(tc.get("ignore_ratio", 0.5))
        r1 = (1 - center_ratio) / 2
        r2 = (1 - ignore_ratio) / 2
        gen = self._approx_gen()
        strides = [s[0] for s in gen.strides]
        num_lvls = len(featmap_sizes)
        min_sz = float(gen.octave_base_scale or gen.scales[0]) * strides[0]

        def single(gt, valid):
            scale = jnp.sqrt(jnp.maximum(
                (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1]), 1e-6))
            tlvl = jnp.clip(jnp.floor(jnp.log2(scale / min_sz) + 0.5),
                            0, num_lvls - 1).astype(jnp.int32)
            tgt_flat, w_flat = [], []
            for lvl, (h, w) in enumerate(featmap_sizes):
                fb = gt / strides[lvl]

                def region_mask(ratio):
                    x1 = jnp.clip(jnp.round((1 - ratio) * fb[:, 0]
                                            + ratio * fb[:, 2]), 0, w - 1)
                    y1 = jnp.clip(jnp.round((1 - ratio) * fb[:, 1]
                                            + ratio * fb[:, 3]), 0, h - 1)
                    x2 = jnp.clip(jnp.round(ratio * fb[:, 0]
                                            + (1 - ratio) * fb[:, 2]), 0, w - 1)
                    y2 = jnp.clip(jnp.round(ratio * fb[:, 1]
                                            + (1 - ratio) * fb[:, 3]), 0, h - 1)
                    xx = jnp.arange(w, dtype=gt.dtype)
                    yy = jnp.arange(h, dtype=gt.dtype)
                    inx = (xx[None, :] >= x1[:, None]) & (xx[None, :] <= x2[:, None])
                    iny = (yy[None, :] >= y1[:, None]) & (yy[None, :] <= y2[:, None])
                    return iny[:, :, None] & inx[:, None, :]       # (G,H,W)

                own = valid & (tlvl == lvl)
                nbr = valid & ((tlvl == lvl - 1) | (tlvl == lvl + 1))
                ctr = (region_mask(r1) & own[:, None, None]).any(0)
                ign = (region_mask(r2) & (own | nbr)[:, None, None]).any(0)
                weight = jnp.where(ctr, 1.0, jnp.where(ign, 0.0, 0.1))
                tgt_flat.append(ctr.reshape(-1))
                w_flat.append(weight.reshape(-1))
            return jnp.concatenate(tgt_flat), jnp.concatenate(w_flat)

        ctr_b, w_b = jax.vmap(single)(batch["gt_bboxes"], batch["gt_valid"])
        b = ctr_b.shape[0]
        loc_avg = b * sum(h * w for h, w in featmap_sizes) / 200.0
        labels = jnp.where(ctr_b, 0, 1)     # 0 = fg channel of the 1-logit map
        return labels, w_b, loc_avg

    # ------------------------------------------------- anchors & targets
    def _flat_anchor_arrays(self, featmap_sizes, pad_shape):
        sq_gen = self._square_gen()
        ap_gen = self._approx_gen()
        squares = np.concatenate(
            [np.asarray(a) for a in sq_gen.grid_anchors(featmap_sizes)]
        ).astype(np.float32)                                     # (N, 4)
        napprox = ap_gen.num_base_anchors[0]
        approxs = np.concatenate(
            [np.asarray(a).reshape(-1, napprox, 4)
             for a in ap_gen.grid_anchors(featmap_sizes)]
        ).astype(np.float32)                                     # (N, A, 4)
        valid = np.concatenate(
            [np.asarray(v) for v in sq_gen.valid_flags(featmap_sizes,
                                                       pad_shape)])
        allowed_border = int((self.train_cfg or {}).get("allowed_border", -1))
        if allowed_border >= 0:
            inside = ((squares[:, 0] >= -allowed_border)
                      & (squares[:, 1] >= -allowed_border)
                      & (squares[:, 2] < pad_shape[1] + allowed_border)
                      & (squares[:, 3] < pad_shape[0] + allowed_border))
            valid = valid & inside
        return squares, approxs, valid

    def guided_anchors(self, squares: jnp.ndarray,
                       shape_cat: jnp.ndarray) -> jnp.ndarray:
        """squares (N, 4) + shape deltas (B, N, 2) -> (B, N, 4) anchors
        (_get_guided_anchors_single, guided_anchor_head.py:340-373)."""
        means, stds = self._coder_params("anchor_coder")
        deltas = jnp.concatenate(
            [jnp.zeros_like(shape_cat), jax.lax.stop_gradient(shape_cat)], -1)
        return delta2bbox(squares[None], deltas, means, stds,
                          wh_ratio_clip=1e-6)

    def _build_sampler(self, key: str):
        from ...core.samplers import RandomSampler
        scfg = dict((self.train_cfg or {}).get(key) or {})
        if not scfg or scfg.get("type", "RandomSampler") != "RandomSampler":
            return None
        return RandomSampler(num=int(scfg.get("num", 256)),
                             pos_fraction=float(scfg.get("pos_fraction", 0.5)),
                             neg_pos_ub=int(scfg.get("neg_pos_ub", -1)))

    # ---------------------------------------------------------------- loss
    def loss(self, cls_outs, bbox_outs, shape_outs, loc_outs,
             batch: Dict[str, Any], rng: Optional[jax.Array] = None
             ) -> Dict[str, jnp.ndarray]:
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        pad_shape = batch["pad_shape"]
        squares_np, approxs_np, valid_np = self._flat_anchor_arrays(
            featmap_sizes, pad_shape)
        squares = jnp.asarray(squares_np)
        approxs = jnp.asarray(approxs_np)
        sq_valid = jnp.asarray(valid_np)
        b = cls_outs[0].shape[0]
        n, napprox = approxs_np.shape[:2]

        cls_cat = jnp.concatenate(
            [c.reshape(b, -1, self.cls_out_channels) for c in cls_outs], 1)
        box_cat = jnp.concatenate([r.reshape(b, -1, 4) for r in bbox_outs], 1)
        shape_cat = jnp.concatenate([s.reshape(b, -1, 2) for s in shape_outs], 1)
        loc_cat = jnp.concatenate([p.reshape(b, -1, 1) for p in loc_outs], 1)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rng_ga, rng_cls = jax.random.split(rng)

        # ---- loc branch
        loc_labels, loc_w, loc_avg = self.ga_loc_targets(batch, featmap_sizes)
        loss_loc_fn = LOSSES.build(dict(self.loss_loc or dict(
            type="FocalLoss", use_sigmoid=True, gamma=2.0, alpha=0.25)))
        loss_loc = loss_loc_fn(loc_cat.reshape(b * n, 1),
                               loc_labels.reshape(-1),
                               weight=loc_w.reshape(-1), avg_factor=loc_avg)

        # ---- shape branch (ApproxMaxIoU assignment on squares)
        ga_cfg = dict((self.train_cfg or {}).get("ga_assigner") or dict(
            pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.4))
        ga_cfg.pop("type", None)
        ga_assigner = MaxIoUAssigner(**ga_cfg)
        ga_sampler = self._build_sampler("ga_sampler")

        def shape_single(gt, gt_valid, key):
            ov = bbox_overlaps(approxs.reshape(n * napprox, 4), gt)
            ov = jnp.where(gt_valid[None, :],
                           ov.reshape(n, napprox, -1).max(1), 0.0)
            assigned, _, _ = ga_assigner.assign(
                squares, gt, gt_valid, overlaps=ov, bbox_valid=sq_valid)
            pos = assigned > 0
            neg = assigned == 0
            if ga_sampler is not None:
                res = ga_sampler.sample(key, assigned,
                                        jnp.zeros((n,), jnp.int32))
                pos, neg = res.pos_mask, res.neg_mask
            safe = jnp.clip(assigned - 1, 0, gt.shape[0] - 1)
            return take_rows(gt, safe), pos, neg

        keys = jax.random.split(rng_ga, b)
        bbox_gts, pos_m, neg_m = jax.vmap(shape_single)(
            batch["gt_bboxes"], batch["gt_valid"], keys)
        anchor_total = jnp.maximum(
            pos_m.sum() + (neg_m.sum() if ga_sampler is not None else 0.0),
            1.0)
        means_a, stds_a = self._coder_params("anchor_coder")
        deltas = jnp.concatenate(
            [jnp.zeros_like(shape_cat), shape_cat], -1)
        pred_anchors = delta2bbox(squares[None], deltas, means_a, stds_a,
                                  wh_ratio_clip=1e-6)
        loss_shape_fn = LOSSES.build(dict(self.loss_shape or dict(
            type="BoundedIoULoss", beta=0.2)))
        loss_shape = loss_shape_fn(
            pred_anchors.reshape(-1, 4), bbox_gts.reshape(-1, 4),
            weight=pos_m.reshape(-1, 1).astype(jnp.float32),
            avg_factor=anchor_total)

        # ---- cls/bbox branches on guided anchors
        ganchors = self.guided_anchors(squares, shape_cat)       # (B, N, 4)
        a_cfg = dict((self.train_cfg or {}).get("assigner") or dict(
            pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.0))
        a_cfg.pop("type", None)
        assigner = MaxIoUAssigner(**a_cfg)
        means, stds = self._coder_params("bbox_coder")
        pos_weight = float((self.train_cfg or {}).get("pos_weight", -1))

        def cls_single(anch, gt, gt_labels, gt_valid):
            assigned, _, labels = assigner.assign(
                anch, gt, gt_valid, gt_labels, bbox_valid=sq_valid)
            pos = assigned > 0
            neg = assigned == 0
            safe = jnp.clip(assigned - 1, 0, gt.shape[0] - 1)
            tgt = bbox2delta(anch, gt[safe], means, stds)
            tgt = jnp.where(pos[:, None], tgt, 0.0)
            out_labels = jnp.where(pos, labels, self.num_classes)
            lw = (pos.astype(jnp.float32)
                  * (1.0 if pos_weight <= 0 else pos_weight)
                  + neg.astype(jnp.float32))
            return out_labels, lw, tgt, pos.astype(jnp.float32)

        labels, label_w, bbox_t, pos_mask = jax.vmap(cls_single)(
            ganchors, batch["gt_bboxes"], batch["gt_labels"],
            batch["gt_valid"])

        sampler = self._build_sampler("sampler") if self.sampling else None
        if sampler is not None:
            keys2 = jax.random.split(rng_cls, b)

            def sample_one(key, lbls, lw, pos):
                assigned = jnp.where(pos > 0, 1, jnp.where(lw > 0, 0, -1))
                res = sampler.sample(key, assigned, lbls)
                keep = res.pos_mask | res.neg_mask
                return lw * keep.astype(jnp.float32), \
                    pos * res.pos_mask.astype(jnp.float32)

            label_w, pos_mask = jax.vmap(sample_one)(keys2, labels, label_w,
                                                     pos_mask)
        num_pos = jnp.maximum(pos_mask.sum(), 1.0)
        num_total = (jnp.maximum((label_w > 0).sum(), 1.0)
                     if self.sampling else num_pos)
        loss_cls_fn = LOSSES.build(dict(self.loss_cls or dict(
            type="FocalLoss", use_sigmoid=True, gamma=2.0, alpha=0.25)))
        loss_bbox_fn = LOSSES.build(dict(self.loss_bbox or dict(
            type="SmoothL1Loss", beta=0.04)))
        loss_cls = loss_cls_fn(cls_cat.reshape(b * n, -1), labels.reshape(-1),
                               weight=label_w.reshape(-1),
                               avg_factor=num_total)
        loss_bbox = loss_bbox_fn(box_cat, bbox_t, weight=pos_mask[..., None],
                                 avg_factor=num_total)
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "loss_shape": loss_shape, "loss_loc": loss_loc,
                "num_pos": num_pos}

    # ------------------------------------------------------------ decode
    def get_bboxes(self, cls_outs, bbox_outs, shape_outs, loc_outs,
                   img_shapes, pad_shape, scale_factors=None,
                   rescale: bool = False) -> DetResult:
        cfg = self.test_cfg or {}
        nms_pre = int(cfg.get("nms_pre", 1000))
        score_thr = float(cfg.get("score_thr", 0.05))
        iou_thr = float(cfg.get("nms", {}).get("iou_threshold", 0.5))
        max_per_img = int(cfg.get("max_per_img", 100))
        means, stds = self._coder_params("bbox_coder")
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        sq_gen = self._square_gen()
        level_squares = [np.asarray(a).astype(np.float32)
                         for a in sq_gen.grid_anchors(featmap_sizes)]
        b = cls_outs[0].shape[0]
        means_a, stds_a = self._coder_params("anchor_coder")

        def single(cls_list, box_list, shp_list, loc_list, img_shape,
                   scale_factor):
            pts, scs = [], []
            for lvl in range(len(cls_list)):
                sc = (jax.nn.sigmoid(cls_list[lvl])
                      if self.use_sigmoid_cls
                      else jax.nn.softmax(cls_list[lvl], -1))
                loc_keep = jax.nn.sigmoid(loc_list[lvl][:, 0]) \
                    >= self.loc_filter_thr
                sc = sc * loc_keep[:, None].astype(sc.dtype)
                sq = jnp.asarray(level_squares[lvl])
                deltas = jnp.concatenate(
                    [jnp.zeros_like(shp_list[lvl]), shp_list[lvl]], -1)
                ganch = delta2bbox(sq, deltas, means_a, stds_a,
                                   wh_ratio_clip=1e-6)
                max_s = (jnp.max(sc, -1) if self.use_sigmoid_cls
                         else jnp.max(sc[:, :-1], -1))
                k = min(nms_pre, sc.shape[0]) if nms_pre > 0 else sc.shape[0]
                _, idx = jax.lax.top_k(max_s, k)
                boxes = delta2bbox(ganch[idx], box_list[lvl][idx], means, stds)
                boxes = jnp.stack([
                    jnp.clip(boxes[:, 0], 0, img_shape[1]),
                    jnp.clip(boxes[:, 1], 0, img_shape[0]),
                    jnp.clip(boxes[:, 2], 0, img_shape[1]),
                    jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
                pts.append(boxes)
                scs.append(sc[idx])
            boxes = jnp.concatenate(pts)
            scores = jnp.concatenate(scs)
            if rescale and scale_factor is not None:
                boxes = boxes / scale_factor
            if self.use_sigmoid_cls:
                scores = jnp.concatenate(
                    [scores, jnp.zeros((scores.shape[0], 1))], -1)
            return multiclass_nms(boxes, scores, score_thr, iou_thr,
                                  max_per_img)

        cls_levels = [c.reshape(b, -1, self.cls_out_channels)
                      for c in cls_outs]
        box_levels = [r.reshape(b, -1, 4) for r in bbox_outs]
        shp_levels = [s.reshape(b, -1, 2) for s in shape_outs]
        loc_levels = [p.reshape(b, -1, 1) for p in loc_outs]
        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        dets = jax.vmap(single)(cls_levels, box_levels, shp_levels,
                                loc_levels, img_shapes, sf)
        return dets, None


@HEADS.register_module()
class GARetinaHead(GuidedAnchorHead):
    """GA-RetinaNet head (ga_retina_head.py:10): stacked convs, separate
    cls/reg feature adaption, 3x3 prediction convs."""

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        norm = (self.norm_cfg or {}).get("type")
        cls_convs = [ConvModule(self.feat_channels, 3, norm=norm,
                                dtype=self.dtype, name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [ConvModule(self.feat_channels, 3, norm=norm,
                                dtype=self.dtype, name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        conv_loc = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv_loc",
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(
                               bias_init_with_prob(0.01)))
        conv_shape = nn.Conv(2, (1, 1), dtype=self.dtype, name="conv_shape",
                             kernel_init=nn.initializers.normal(0.01))
        adaption_cls = FeatureAdaption(self.feat_channels,
                                       deform_groups=self.deform_groups,
                                       dtype=self.dtype,
                                       name="feature_adaption_cls")
        adaption_reg = FeatureAdaption(self.feat_channels,
                                       deform_groups=self.deform_groups,
                                       dtype=self.dtype,
                                       name="feature_adaption_reg")
        retina_cls = nn.Conv(self.cls_out_channels, (3, 3), padding=1,
                             dtype=self.dtype, name="retina_cls",
                             kernel_init=nn.initializers.normal(0.01),
                             bias_init=nn.initializers.constant(
                                 bias_init_with_prob(0.01)))
        retina_reg = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name="retina_reg")
        cls_outs, reg_outs, shape_outs, loc_outs = [], [], [], []
        for f in feats:
            cf, rf = f, f
            for conv in cls_convs:
                cf = conv(cf, train=train)
            for conv in reg_convs:
                rf = conv(rf, train=train)
            loc = conv_loc(cf)
            shp = conv_shape(rf)
            cls_outs.append(retina_cls(adaption_cls(cf, shp)))
            reg_outs.append(retina_reg(adaption_reg(rf, shp)))
            shape_outs.append(shp)
            loc_outs.append(loc)
        return cls_outs, reg_outs, shape_outs, loc_outs


@HEADS.register_module()
class GARPNHead(GuidedAnchorHead):
    """GA-RPN head (mmdet models/dense_heads/ga_rpn_head.py): shared 3x3
    conv before the GA branches; proposals instead of final dets."""

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        rpn_conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                           kernel_init=nn.initializers.normal(0.01),
                           dtype=self.dtype, name="rpn_conv")
        base = GuidedAnchorHead(
            num_classes=self.num_classes, in_channels=self.feat_channels,
            feat_channels=self.feat_channels,
            approx_anchor_generator=self.approx_anchor_generator,
            square_anchor_generator=self.square_anchor_generator,
            anchor_coder=self.anchor_coder, bbox_coder=self.bbox_coder,
            deform_groups=self.deform_groups,
            loc_filter_thr=self.loc_filter_thr,
            loss_cls=self.loss_cls, loss_bbox=self.loss_bbox,
            train_cfg=self.train_cfg, test_cfg=self.test_cfg,
            dtype=self.dtype, name="ga_base")
        smoothed = [nn.relu(rpn_conv(f)) for f in feats]
        return base(smoothed, train=train)

    def get_proposals(self, cls_outs, bbox_outs, shape_outs, loc_outs,
                      img_shapes, pad_shape, proposal_cfg: dict):
        """RPN-style proposal generation with guided anchors + loc filter.
        Returns proposals (B, P, 4), scores (B, P), valid (B, P)."""
        from ...ops.nms import batched_nms
        nms_pre = int(proposal_cfg.get("nms_pre", 1000))
        max_per_img = int(proposal_cfg.get("max_per_img", 1000))
        iou_thr = float(proposal_cfg.get("nms", {}).get(
            "iou_threshold", 0.7))
        means, stds = self._coder_params("bbox_coder")
        means_a, stds_a = self._coder_params("anchor_coder")
        featmap_sizes = [c.shape[1:3] for c in cls_outs]
        sq_gen = self._square_gen()
        level_squares = [np.asarray(a).astype(np.float32)
                         for a in sq_gen.grid_anchors(featmap_sizes)]
        b = cls_outs[0].shape[0]

        def single(cls_list, box_list, shp_list, loc_list, img_shape):
            boxes_all, scores_all, lvl_ids = [], [], []
            for lvl in range(len(cls_list)):
                logits = cls_list[lvl][..., 0]
                sc = jax.nn.sigmoid(logits)
                loc_keep = jax.nn.sigmoid(loc_list[lvl][:, 0]) \
                    >= self.loc_filter_thr
                sc = sc * loc_keep.astype(sc.dtype)
                k = min(nms_pre, sc.shape[0])
                top_sc, idx = jax.lax.top_k(sc, k)
                sq = jnp.asarray(level_squares[lvl])
                deltas = jnp.concatenate(
                    [jnp.zeros_like(shp_list[lvl]), shp_list[lvl]], -1)
                ganch = delta2bbox(sq, deltas, means_a, stds_a,
                                   wh_ratio_clip=1e-6)
                boxes = delta2bbox(ganch[idx], box_list[lvl][idx],
                                   means, stds)
                boxes = jnp.stack([
                    jnp.clip(boxes[:, 0], 0, img_shape[1]),
                    jnp.clip(boxes[:, 1], 0, img_shape[0]),
                    jnp.clip(boxes[:, 2], 0, img_shape[1]),
                    jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
                boxes_all.append(boxes)
                scores_all.append(top_sc)
                lvl_ids.append(jnp.full((k,), lvl, jnp.int32))
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            ids = jnp.concatenate(lvl_ids)
            keep_idx, _ = batched_nms(boxes, scores, ids, iou_thr,
                                      max_per_img)
            valid = keep_idx >= 0
            safe = jnp.where(valid, keep_idx, 0)
            return boxes[safe], jnp.where(valid, scores[safe], 0.0), valid

        cls_levels = [c.reshape(b, -1, self.cls_out_channels)
                      for c in cls_outs]
        box_levels = [r.reshape(b, -1, 4) for r in bbox_outs]
        shp_levels = [s.reshape(b, -1, 2) for s in shape_outs]
        loc_levels = [p.reshape(b, -1, 1) for p in loc_outs]
        return jax.vmap(single)(cls_levels, box_levels, shp_levels,
                                loc_levels, img_shapes)
