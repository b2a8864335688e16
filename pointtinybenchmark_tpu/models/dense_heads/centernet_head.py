"""CenterNet (Objects as Points) neck + head.

Parity target: mmdet models/necks/ct_resnet_neck.py (deconv upsampling to
stride 4) and models/dense_heads/centernet_head.py — gaussian heatmap
targets (gaussian_radius / gen_gaussian_target), GaussianFocalLoss, L1 on
wh/offset at center pixels, NMS-free local-maximum decoding.

TPU design: per-gt gaussians are rendered with a single vectorized
max-scatter of a fixed-size stamp; decoding is a 3x3 max-pool equality test
plus top-k — all static shapes.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.post_processing import DetResult
from ...utils.registry import HEADS, LOSSES, NECKS

__all__ = ["CTResNetNeck", "CenterNetHead", "GaussianFocalLoss"]

STAMP = 32  # gaussian stamp half-size bound (pixels on the heatmap)


@LOSSES.register_module()
class GaussianFocalLoss:
    """mmdet models/losses/gaussian_focal_loss.py parity."""

    def __init__(self, alpha: float = 2.0, gamma: float = 4.0,
                 loss_weight: float = 1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.loss_weight = loss_weight

    def __call__(self, pred, gaussian_target, avg_factor=None):
        eps = 1e-12
        pos_w = (gaussian_target == 1).astype(pred.dtype)
        neg_w = (1 - gaussian_target) ** self.gamma
        pos = -jnp.log(pred + eps) * (1 - pred) ** self.alpha * pos_w
        neg = -jnp.log(1 - pred + eps) * pred ** self.alpha * neg_w \
            * (1 - pos_w)
        loss = (pos + neg).sum()
        if avg_factor is not None:
            loss = loss / jnp.maximum(avg_factor, 1.0)
        return self.loss_weight * loss


@NECKS.register_module()
class CTResNetNeck(nn.Module):
    in_channels: int = 512
    num_deconv_filters: Sequence[int] = (256, 128, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[-1]
        use_ra = not train
        for i, ch in enumerate(self.num_deconv_filters):
            x = nn.Conv(ch, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=use_ra,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME",
                                 use_bias=False, dtype=self.dtype,
                                 name=f"deconv{i}")(x)
            x = nn.BatchNorm(use_running_average=use_ra,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        return (x,)


def gaussian_radius(h, w, min_overlap: float = 0.3):
    """CornerNet radius heuristic (mmdet utils/gaussian_target.py:167-186
    — the CORRECTED quadratic roots (b-sq)/(2a), not the original
    CornerNet repo's (b+sq)/2 which overestimates the radius ~2-3x;
    golden-tested vs the reference)."""
    a1 = 1
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.clip(b1 ** 2 - 4 * a1 * c1, 0, None))
    r1 = (b1 - sq1) / (2 * a1)
    a2 = 4
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    sq2 = jnp.sqrt(jnp.clip(b2 ** 2 - 4 * a2 * c2, 0, None))
    r2 = (b2 - sq2) / (2 * a2)
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    sq3 = jnp.sqrt(jnp.clip(b3 ** 2 - 4 * a3 * c3, 0, None))
    r3 = (b3 + sq3) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


@HEADS.register_module()
class CenterNetHead(nn.Module):
    num_classes: int
    in_channels: int = 64
    feat_channels: int = 64
    stride: int = 4
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[0]

        def branch(out_ch, name, bias=0.0):
            y = nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                                dtype=self.dtype, name=f"{name}_conv")(x))
            return nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                           bias_init=nn.initializers.constant(bias),
                           name=f"{name}_out")(y)

        heatmap = branch(self.num_classes, "heatmap", bias=-2.19)  # p≈0.1
        wh = branch(2, "wh")
        offset = branch(2, "offset")
        return heatmap, wh, offset

    # ------------------------------------------------------------- targets
    def _targets(self, hm_shape, gt_bboxes, gt_labels, gt_valid):
        """Render gaussian heatmaps + wh/offset targets. Shapes static."""
        h, w = hm_shape
        s = float(self.stride)
        cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2 / s
        cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2 / s
        gw = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) / s
        gh = (gt_bboxes[:, 3] - gt_bboxes[:, 1]) / s
        ix = jnp.clip(cx.astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(cy.astype(jnp.int32), 0, h - 1)
        radius = jnp.clip(gaussian_radius(gh, gw), 1.0, STAMP - 1.0)
        sigma = (2 * radius + 1) / 6.0

        # vectorized gaussian render: for each gt a (2*STAMP+1)^2 stamp
        # max-scattered into the (C, H, W) heatmap
        g = gt_bboxes.shape[0]
        d = 2 * STAMP + 1
        dy, dx = jnp.meshgrid(jnp.arange(-STAMP, STAMP + 1),
                              jnp.arange(-STAMP, STAMP + 1), indexing="ij")
        stamp = jnp.exp(-(dx[None] ** 2 + dy[None] ** 2)
                        / (2 * sigma[:, None, None] ** 2))       # (G, d, d)
        stamp = jnp.where(
            (jnp.abs(dx)[None] <= radius[:, None, None])
            & (jnp.abs(dy)[None] <= radius[:, None, None]), stamp, 0.0)
        stamp = stamp * gt_valid[:, None, None]
        ys = jnp.clip(iy[:, None, None] + dy[None], 0, h - 1)
        xs = jnp.clip(ix[:, None, None] + dx[None], 0, w - 1)
        oob = ((iy[:, None, None] + dy[None]) != ys) | \
              ((ix[:, None, None] + dx[None]) != xs)
        stamp = jnp.where(oob, 0.0, stamp)
        hm = jnp.zeros((self.num_classes, h, w))
        cls_idx = jnp.clip(gt_labels, 0, self.num_classes - 1)
        flat_idx = (cls_idx[:, None, None] * (h * w) + ys * w + xs).reshape(-1)
        hm = hm.reshape(-1).at[flat_idx].max(stamp.reshape(-1)).reshape(
            self.num_classes, h, w)
        # exact 1.0 at centers
        center_idx = cls_idx * (h * w) + iy * w + ix
        hm = hm.reshape(-1).at[center_idx].max(
            gt_valid.astype(jnp.float32)).reshape(self.num_classes, h, w)

        # wh / offset at center pixels
        pix = iy * w + ix
        wh_t = jnp.zeros((h * w, 2)).at[pix].set(
            jnp.where(gt_valid[:, None], jnp.stack([gw, gh], -1), 0.0))
        off_t = jnp.zeros((h * w, 2)).at[pix].set(
            jnp.where(gt_valid[:, None],
                      jnp.stack([cx - ix, cy - iy], -1), 0.0))
        mask = jnp.zeros((h * w,)).at[pix].max(gt_valid.astype(jnp.float32))
        return hm.transpose(1, 2, 0), wh_t.reshape(h, w, 2), \
            off_t.reshape(h, w, 2), mask.reshape(h, w)

    # ---------------------------------------------------------------- loss
    def loss(self, heatmap, wh, offset, batch: Dict[str, Any], rng=None):
        b, h, w, _ = heatmap.shape
        hm_t, wh_t, off_t, mask = jax.vmap(
            lambda gb, gl, gv: self._targets((h, w), gb, gl, gv))(
                batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"])
        num_pos = jnp.maximum(mask.sum(), 1.0)
        gfl = GaussianFocalLoss(loss_weight=1.0)
        pred_hm = jnp.clip(jax.nn.sigmoid(heatmap), 1e-4, 1 - 1e-4)
        loss_hm = gfl(pred_hm, hm_t, avg_factor=num_pos)
        m = mask[..., None]
        loss_wh = 0.1 * (jnp.abs(wh - wh_t) * m).sum() / num_pos
        loss_off = (jnp.abs(offset - off_t) * m).sum() / num_pos
        return {"loss_center_heatmap": loss_hm, "loss_wh": loss_wh,
                "loss_offset": loss_off, "num_pos": mask.sum()}

    # ------------------------------------------------------------ inference
    def get_bboxes(self, heatmap, wh, offset, img_shapes, pad_shape,
                   scale_factors=None, rescale: bool = False) -> DetResult:
        cfg = self.test_cfg or {}
        k = int(cfg.get("topk", 100))
        score_thr = float(cfg.get("score_thr", 0.1))
        b, h, w, c = heatmap.shape
        s = float(self.stride)
        hm = jax.nn.sigmoid(heatmap)
        # local maxima (3x3)
        hmax = nn.max_pool(hm, (3, 3), strides=(1, 1),
                           padding=((1, 1), (1, 1)))
        hm = jnp.where(hm == hmax, hm, 0.0)

        def single(hm_i, wh_i, off_i, img_shape, scale_factor):
            flat = hm_i.transpose(2, 0, 1).reshape(-1)  # (C*H*W)
            scores, idx = jax.lax.top_k(flat, k)
            ci = idx // (h * w)
            pix = idx % (h * w)
            py = pix // w
            px = pix % w
            ox = off_i.reshape(-1, 2)[pix]
            whp = wh_i.reshape(-1, 2)[pix]
            cxp = (px + ox[:, 0]) * s
            cyp = (py + ox[:, 1]) * s
            bw = whp[:, 0] * s
            bh = whp[:, 1] * s
            boxes = jnp.stack([cxp - bw / 2, cyp - bh / 2,
                               cxp + bw / 2, cyp + bh / 2], -1)
            boxes = jnp.stack([
                jnp.clip(boxes[:, 0], 0, img_shape[1]),
                jnp.clip(boxes[:, 1], 0, img_shape[0]),
                jnp.clip(boxes[:, 2], 0, img_shape[1]),
                jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
            if rescale and scale_factor is not None:
                boxes = boxes / scale_factor
            dets = jnp.concatenate([boxes, scores[:, None]], -1)
            return DetResult(dets, ci.astype(jnp.int32), scores > score_thr)

        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        dets = jax.vmap(single)(hm, wh, offset, img_shapes, sf)
        return dets, None
