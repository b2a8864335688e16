"""PointRend — mask refinement at adaptively chosen points (arXiv 1912.08193).

Parity targets:
- mmdet models/roi_heads/point_rend_roi_head.py (PointRendRoIHead): coarse
  FCN mask + an MLP point head; train: uncertainty-biased random point
  sampling (oversample_ratio 3, importance_sample_ratio 0.75) with point BCE;
  test: iterative subdivision — upsample, re-predict the most uncertain
  points, scatter back.
- mmdet models/roi_heads/mask_heads/mask_point_head.py (MaskPointHead): 3
  shared FCs over [fine-grained stride-4 features at the point ++ coarse
  logits at the point], coarse prediction re-appended at each layer.
- mmcv ops point_sample / rel_roi_point_to_rel_img_point → the existing
  XLA bilinear sampler (`ops/grid_sample.point_sample_pixel`).

TPU notes: point budgets are static (train_num_points, subdivision points);
uncertainty top-k is `lax.top_k`; subdivision runs a fixed number of steps
(config `subdivision_steps`) — every shape in the refinement loop is
compile-time constant.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.grid_sample import point_sample_pixel
from ...utils.registry import HEADS
from .standard_roi_head import StandardRoIHead

__all__ = ["MaskPointHead", "PointRendRoIHead"]


@HEADS.register_module()
class MaskPointHead(nn.Module):
    """mask_point_head.py:15 — per-point MLP."""
    num_classes: int = 80
    num_fcs: int = 3
    in_channels: int = 256
    fc_channels: int = 256
    coarse_pred_each_layer: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fine_feats: jnp.ndarray,
                 coarse_logits: jnp.ndarray) -> jnp.ndarray:
        """fine_feats (R, P, C), coarse_logits (R, P, nc) -> (R, P, nc)."""
        x = jnp.concatenate([fine_feats, coarse_logits], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype,
                                 name=f"fc{i}")(x))
            if self.coarse_pred_each_layer:
                x = jnp.concatenate([x, coarse_logits], -1)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.001),
                        name="fc_logits")(x)


def _uncertainty(logits: jnp.ndarray) -> jnp.ndarray:
    """-(|logit|) of the selected class — closest to the decision boundary
    is most uncertain (point_rend uncertainty())."""
    return -jnp.abs(logits)


@HEADS.register_module()
class PointRendRoIHead(StandardRoIHead):
    point_head: Optional[dict] = None

    def setup(self):
        super().setup()
        cfg = dict(self.point_head or {})
        cfg.pop("type", None)
        cfg.setdefault("num_classes", self.num_classes)
        self.point_head_m = MaskPointHead(**cfg)

    # --------------------------------------------------------------- util
    def _fine_feats_at(self, feats, rois, rel_pts):
        """Sample stride-4 pyramid features at roi-relative points.

        rois (R, 5) in image-major order (R = B * S); rel_pts (R, P, 2) in
        [0, 1]^2. Returns (R, P, C). Points are regrouped per image so the
        gather never materializes a per-RoI copy of the feature map."""
        stride = float(tuple(dict(self.bbox_roi_extractor or {}).get(
            "featmap_strides", (4, 8, 16, 32)))[0])
        x1, y1 = rois[:, 1:2], rois[:, 2:3]
        w = jnp.maximum(rois[:, 3:4] - x1, 1e-3)
        h = jnp.maximum(rois[:, 4:5] - y1, 1e-3)
        ax = (x1 + rel_pts[..., 0] * w) / stride - 0.5
        ay = (y1 + rel_pts[..., 1] * h) / stride - 0.5
        lvl0 = feats[0]                                    # (B, H, W, C)
        b = lvl0.shape[0]
        r, p = rel_pts.shape[:2]
        s = r // b
        pts = jnp.stack([ax, ay], -1).reshape(b, s * p, 2)
        out = point_sample_pixel(lvl0, pts)                # (B, S*P, C)
        return out.reshape(r, p, -1)

    @staticmethod
    def _coarse_at(coarse: jnp.ndarray, rel_pts: jnp.ndarray) -> jnp.ndarray:
        """Sample the coarse logit map (R, s, s, nc) at relative points."""
        s = coarse.shape[1]
        pts = rel_pts * s - 0.5
        return point_sample_pixel(coarse, pts)

    # -------------------------------------------------------------- train
    def _mask_extras(self, out, mask_feats, mask_logits, logits_cls,
                     targets, rois, labels_flat, pos_flat, gt_idx,
                     batch) -> None:
        cfg = dict(self.train_cfg or {})
        num_points = int(cfg.get("num_points", 196))
        oversample = int(cfg.get("oversample_ratio", 3))
        imp_ratio = float(cfg.get("importance_sample_ratio", 0.75))
        r = mask_logits.shape[0]
        nc = self.num_classes
        key = self.make_rng("sampler") if self.has_rng("sampler") else \
            jax.random.PRNGKey(11)
        k1, k2 = jax.random.split(key)

        n_over = num_points * oversample
        cand = jax.random.uniform(k1, (r, n_over, 2))
        coarse_cand = self._coarse_at(mask_logits, cand)   # (R, n_over, nc)
        safe_lbl = jnp.clip(labels_flat, 0, nc - 1)
        cls_logit = jnp.take_along_axis(
            coarse_cand, safe_lbl[:, None, None], -1)[..., 0]
        unc = _uncertainty(cls_logit)
        n_imp = int(num_points * imp_ratio)
        n_rand = num_points - n_imp
        _, top = jax.lax.top_k(unc, n_imp)                 # (R, n_imp)
        imp_pts = jnp.take_along_axis(cand, top[..., None], 1)
        rand_pts = jax.random.uniform(k2, (r, n_rand, 2))
        pts = jnp.concatenate([imp_pts, rand_pts], 1)      # (R, P, 2)

        feats_holder = self._pr_feats
        fine = self._fine_feats_at(feats_holder, rois, pts)
        coarse_pts = self._coarse_at(mask_logits, pts)
        point_logits = self.point_head_m(fine, coarse_pts)  # (R, P, nc)
        pl = jnp.take_along_axis(point_logits,
                                 safe_lbl[:, None, None], -1)[..., 0]

        # gt value at the points: sample every gt bitmap of the image at the
        # image's points (pure gathers), then pick the matched instance —
        # avoids materializing a per-RoI copy of the (H, W) bitmaps.
        gm = batch["gt_masks"].astype(jnp.float32)          # (B, G, H, W)
        b, g = gm.shape[:2]
        s = r // b
        x1, y1 = rois[:, 1:2], rois[:, 2:3]
        w = jnp.maximum(rois[:, 3:4] - x1, 1e-3)
        h = jnp.maximum(rois[:, 4:5] - y1, 1e-3)
        ax = x1 + pts[..., 0] * w - 0.5
        ay = y1 + pts[..., 1] * h - 0.5
        pp = pts.shape[1]
        img_pts = jnp.stack([ax, ay], -1).reshape(b, s * pp, 2)

        def per_image(masks_g, p2):
            # masks_g (G, H, W); sample all G at all points -> (G, S*P)
            return point_sample_pixel(
                masks_g[..., None],
                jnp.broadcast_to(p2[None], (g,) + p2.shape))[..., 0]

        all_vals = jax.vmap(per_image)(gm, img_pts)         # (B, G, S*P)
        idx = jnp.broadcast_to(
            gt_idx.reshape(b, 1, s, 1).astype(jnp.int32), (b, 1, s, pp))
        vals = jnp.take_along_axis(all_vals.reshape(b, g, s, pp), idx,
                                   axis=1)[:, 0]            # (B, S, P)
        gt_pts = (vals.reshape(r, pp) >= 0.5).astype(jnp.float32)
        bce = (jnp.maximum(pl, 0) - pl * gt_pts
               + jnp.log1p(jnp.exp(-jnp.abs(pl))))
        num_pos = jnp.maximum(pos_flat.sum(), 1.0)
        out["loss_point"] = (bce.mean(-1) * pos_flat).sum() / num_pos

    def _mask_loss(self, feats, rois, roi_labels, pos_w, gt_idx, batch):
        object.__setattr__(self, "_pr_feats", feats)
        return super()._mask_loss(feats, rois, roi_labels, pos_w, gt_idx,
                                  batch)

    # ------------------------------------------------------------ test
    def simple_test(self, feats, proposals, prop_valid, img_shapes,
                    scale_factors=None, rescale: bool = False):
        out = super().simple_test(feats, proposals, prop_valid, img_shapes,
                                  scale_factors, rescale)
        if self.mask_head_m is None:
            # still build point-head params
            dummy = jnp.zeros((1, 1, int(dict(
                self.bbox_roi_extractor or {}).get("out_channels", 256))))
            self.point_head_m(dummy, jnp.zeros((1, 1, self.num_classes)))
            return out
        dets, masks = out
        cfg = dict(self.test_cfg or {})
        steps = int(cfg.get("subdivision_steps", 2))
        sub_pts = int(cfg.get("subdivision_num_points", 196))
        nc = self.num_classes
        b, m, msz = masks.shape[:3]
        det_boxes = dets.bboxes[..., :4]
        if rescale and scale_factors is not None:
            det_boxes = det_boxes * scale_factors[:, None, :]
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), m)[:, None]
        rois = jnp.concatenate([bidx, det_boxes.reshape(b * m, 4)], 1)
        safe_lbl = jnp.clip(dets.labels.reshape(-1), 0, nc - 1)

        # refine the class-selected prob map by subdivision
        prob = masks.reshape(b * m, msz, msz)
        # recompute class logits map for refinement (logit space)
        logit = jnp.log(jnp.clip(prob, 1e-6, 1 - 1e-6)) \
            - jnp.log1p(-jnp.clip(prob, 1e-6, 1 - 1e-6))
        size = msz
        for _ in range(steps):
            size *= 2
            logit = jax.image.resize(
                logit[..., None], (logit.shape[0], size, size, 1),
                method="bilinear")[..., 0]
            unc = -jnp.abs(logit).reshape(logit.shape[0], -1)
            k = min(sub_pts, size * size)
            _, top = jax.lax.top_k(unc, k)                 # (R, k)
            py = (top // size).astype(jnp.float32)
            px = (top % size).astype(jnp.float32)
            rel = jnp.stack([(px + 0.5) / size, (py + 0.5) / size], -1)
            fine = self._fine_feats_at(feats, rois, rel)
            # coarse logits at those points for all classes
            coarse_full = jnp.log(jnp.clip(
                jax.nn.sigmoid(logit), 1e-6, 1 - 1e-6))[..., None]
            coarse_nc = jnp.broadcast_to(
                self._coarse_at(logit[..., None], rel),
                (rois.shape[0], k, 1))
            coarse_nc = jnp.broadcast_to(coarse_nc, (rois.shape[0], k, nc))
            new_logits = self.point_head_m(fine, coarse_nc)
            new_cls = jnp.take_along_axis(new_logits,
                                          safe_lbl[:, None, None], -1)[..., 0]
            flat = logit.reshape(logit.shape[0], -1)
            flat = jax.vmap(lambda f, t, v: f.at[t].set(v))(flat, top,
                                                            new_cls)
            logit = flat.reshape(logit.shape[0], size, size)
            del coarse_full
        refined = jax.nn.sigmoid(logit).reshape(b, m, size, size)
        return dets, refined
