"""CornerHead — CornerNet keypoint-pair detection.

Parity target: mmdet models/dense_heads/corner_head.py + the mmcv
CornerPool CUDA op and AssociativeEmbeddingLoss — top-left/bottom-right
corner heatmaps with gaussian targets, per-corner embeddings paired by
distance (pull/push AE loss), sub-pixel offsets, decode by top-k corner
pairing with embedding and geometry gates.

TPU design: corner pooling is exactly a (reversed) running max — one
`jax.lax.cummax` per direction instead of the CUDA kernel. The pairwise
decode is a static (K, K) tensor program; gaussian targets reuse the
CenterNet max-scatter renderer.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.post_processing import DetResult
from ...utils.registry import HEADS
from .centernet_head import GaussianFocalLoss, STAMP, gaussian_radius

__all__ = ["CornerHead", "corner_pool"]


def corner_pool(x: jnp.ndarray, direction: str) -> jnp.ndarray:
    """(B, H, W, C) running max. 'top': each pixel sees everything below;
    'left': everything to the right; 'bottom'/'right': the opposites."""
    if direction == "top":
        return jnp.flip(jax.lax.cummax(jnp.flip(x, 1), axis=1), 1)
    if direction == "bottom":
        return jax.lax.cummax(x, axis=1)
    if direction == "left":
        return jnp.flip(jax.lax.cummax(jnp.flip(x, 2), axis=2), 2)
    if direction == "right":
        return jax.lax.cummax(x, axis=2)
    raise ValueError(direction)


@HEADS.register_module()
class CornerHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stride: int = 4
    corner_emb_channels: int = 1
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """Uses the last hourglass stack. Returns per-corner
        (heatmap, embedding, offset)."""
        x = feats[-1]

        def branch(name, pool_a, pool_b):
            a = nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                                dtype=self.dtype, name=f"{name}_pa")(x))
            b_ = nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                                 dtype=self.dtype, name=f"{name}_pb")(x))
            p = corner_pool(a, pool_a) + corner_pool(b_, pool_b)
            p = nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                                dtype=self.dtype, name=f"{name}_fuse")(p))

            def head(out_ch, hname, bias=0.0):
                y = nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                                    dtype=self.dtype,
                                    name=f"{name}_{hname}_c")(p))
                return nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                               bias_init=nn.initializers.constant(bias),
                               name=f"{name}_{hname}_out")(y)

            hm = head(self.num_classes, "hm", bias=-2.19)
            emb = head(self.corner_emb_channels, "emb")
            off = head(2, "off")
            return hm, emb, off

        tl = branch("tl", "top", "left")
        br = branch("br", "bottom", "right")
        return tl, br

    # ------------------------------------------------------------- targets
    def _corner_targets(self, hm_shape, xs, ys, gt_w, gt_h, gt_labels,
                        gt_valid):
        """Gaussian heatmap + offset targets for one corner type.
        xs, ys: corner coords in image pixels."""
        h, w = hm_shape
        s = float(self.stride)
        fx = xs / s
        fy = ys / s
        ix = jnp.clip(fx.astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(fy.astype(jnp.int32), 0, h - 1)
        radius = jnp.clip(gaussian_radius(gt_h / s, gt_w / s,
                                          min_overlap=0.3),
                          1.0, STAMP - 1.0)
        sigma = (2 * radius + 1) / 6.0
        d = 2 * STAMP + 1
        dy, dx = jnp.meshgrid(jnp.arange(-STAMP, STAMP + 1),
                              jnp.arange(-STAMP, STAMP + 1), indexing="ij")
        stamp = jnp.exp(-(dx[None] ** 2 + dy[None] ** 2)
                        / (2 * sigma[:, None, None] ** 2))
        stamp = jnp.where(
            (jnp.abs(dx)[None] <= radius[:, None, None])
            & (jnp.abs(dy)[None] <= radius[:, None, None]), stamp, 0.0)
        stamp = stamp * gt_valid[:, None, None]
        ysg = jnp.clip(iy[:, None, None] + dy[None], 0, h - 1)
        xsg = jnp.clip(ix[:, None, None] + dx[None], 0, w - 1)
        oob = ((iy[:, None, None] + dy[None]) != ysg) | \
              ((ix[:, None, None] + dx[None]) != xsg)
        stamp = jnp.where(oob, 0.0, stamp)
        cls_idx = jnp.clip(gt_labels, 0, self.num_classes - 1)
        flat = (cls_idx[:, None, None] * (h * w) + ysg * w
                + xsg).reshape(-1)
        hm = jnp.zeros((self.num_classes * h * w,)).at[flat].max(
            stamp.reshape(-1))
        center = cls_idx * (h * w) + iy * w + ix
        hm = hm.at[center].max(gt_valid.astype(jnp.float32))
        hm = hm.reshape(self.num_classes, h, w).transpose(1, 2, 0)
        pix = iy * w + ix
        off_t = jnp.zeros((h * w, 2)).at[pix].set(
            jnp.where(gt_valid[:, None],
                      jnp.stack([fx - ix, fy - iy], -1), 0.0))
        mask = jnp.zeros((h * w,)).at[pix].max(gt_valid.astype(jnp.float32))
        return hm, off_t.reshape(h, w, 2), mask.reshape(h, w), pix

    # ---------------------------------------------------------------- loss
    def loss(self, tl, br, batch: Dict[str, Any], rng=None):
        tl_hm, tl_emb, tl_off = tl
        br_hm, br_emb, br_off = br
        b, h, w, _ = tl_hm.shape
        gfl = GaussianFocalLoss()

        def single(tl_hm_s, tl_emb_s, tl_off_s, br_hm_s, br_emb_s, br_off_s,
                   gtb, gtl, gv):
            gt_w = gtb[:, 2] - gtb[:, 0]
            gt_h = gtb[:, 3] - gtb[:, 1]
            t_hm, t_off, t_mask, t_pix = self._corner_targets(
                (h, w), gtb[:, 0], gtb[:, 1], gt_w, gt_h, gtl, gv)
            b_hm, b_off, b_mask, b_pix = self._corner_targets(
                (h, w), gtb[:, 2], gtb[:, 3], gt_w, gt_h, gtl, gv)
            num_pos = jnp.maximum(gv.sum().astype(jnp.float32), 1.0)
            p_tl = jnp.clip(jax.nn.sigmoid(tl_hm_s), 1e-4, 1 - 1e-4)
            p_br = jnp.clip(jax.nn.sigmoid(br_hm_s), 1e-4, 1 - 1e-4)
            l_hm = gfl(p_tl, t_hm, avg_factor=num_pos) \
                + gfl(p_br, b_hm, avg_factor=num_pos)
            l_off = ((jnp.abs(tl_off_s - t_off) * t_mask[..., None]).sum()
                     + (jnp.abs(br_off_s - b_off)
                        * b_mask[..., None]).sum()) / num_pos
            # associative embeddings at the gt corner pixels
            e_tl = tl_emb_s.reshape(h * w)[t_pix]
            e_br = br_emb_s.reshape(h * w)[b_pix]
            gvf = gv.astype(jnp.float32)
            e_mean = (e_tl + e_br) / 2
            pull = (((e_tl - e_mean) ** 2 + (e_br - e_mean) ** 2)
                    * gvf).sum() / num_pos
            dist = jnp.abs(e_mean[:, None] - e_mean[None, :])
            pairm = gvf[:, None] * gvf[None, :] \
                * (1 - jnp.eye(gvf.shape[0]))
            push = (jnp.clip(1.0 - dist, 0, None) * pairm).sum() \
                / jnp.maximum(pairm.sum(), 1.0)
            return l_hm, l_off, pull, push, gv.sum().astype(jnp.float32)

        l_hm, l_off, pull, push, npos = jax.vmap(single)(
            tl_hm, tl_emb, tl_off, br_hm, br_emb, br_off,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"])
        return {"loss_heatmap": l_hm.mean(),
                "loss_offset": l_off.mean(),
                "loss_pull": 0.25 * pull.mean(),
                "loss_push": 0.25 * push.mean(),
                "num_pos": npos.sum()}

    # ------------------------------------------------------------ inference
    def get_bboxes(self, tl, br, img_shapes, pad_shape, scale_factors=None,
                   rescale: bool = False) -> DetResult:
        cfg = self.test_cfg or {}
        k = int(cfg.get("corner_topk", 32))
        max_per_img = int(cfg.get("max_per_img", 100))
        score_thr = float(cfg.get("score_thr", 0.05))
        dist_thr = float(cfg.get("distance_threshold", 0.5))
        tl_hm, tl_emb, tl_off = tl
        br_hm, br_emb, br_off = br
        b, h, w, c = tl_hm.shape
        s = float(self.stride)

        def nms_hm(x):
            m = nn.max_pool(x, (3, 3), strides=(1, 1),
                            padding=((1, 1), (1, 1)))
            return jnp.where(x == m, x, 0.0)

        tl_p = nms_hm(jax.nn.sigmoid(tl_hm))
        br_p = nms_hm(jax.nn.sigmoid(br_hm))

        def topk_corners(hm, emb, off):
            flat = hm.transpose(2, 0, 1).reshape(-1)
            sc, idx = jax.lax.top_k(flat, k)
            ci = idx // (h * w)
            pix = idx % (h * w)
            py = (pix // w).astype(jnp.float32)
            px = (pix % w).astype(jnp.float32)
            o = off.reshape(-1, 2)[pix]
            e = emb.reshape(-1)[pix]
            return sc, ci, (px + o[:, 0]) * s, (py + o[:, 1]) * s, e

        def single(tl_p_s, tl_e_s, tl_o_s, br_p_s, br_e_s, br_o_s,
                   img_shape, scale_factor):
            s_tl, c_tl, x_tl, y_tl, e_tl = topk_corners(tl_p_s, tl_e_s,
                                                        tl_o_s)
            s_br, c_br, x_br, y_br, e_br = topk_corners(br_p_s, br_e_s,
                                                        br_o_s)
            score = (s_tl[:, None] + s_br[None, :]) / 2      # (K, K)
            ok = (c_tl[:, None] == c_br[None, :]) \
                & (x_br[None, :] > x_tl[:, None]) \
                & (y_br[None, :] > y_tl[:, None]) \
                & (jnp.abs(e_tl[:, None] - e_br[None, :]) < dist_thr)
            score = jnp.where(ok, score, 0.0)
            flat = score.reshape(-1)
            top_sc, idx = jax.lax.top_k(flat, max_per_img)
            ti = idx // k
            bi = idx % k
            boxes = jnp.stack([
                jnp.clip(x_tl[ti], 0, img_shape[1]),
                jnp.clip(y_tl[ti], 0, img_shape[0]),
                jnp.clip(x_br[bi], 0, img_shape[1]),
                jnp.clip(y_br[bi], 0, img_shape[0])], -1)
            if rescale and scale_factor is not None:
                boxes = boxes / scale_factor
            dets = jnp.concatenate([boxes, top_sc[:, None]], -1)
            return DetResult(dets, c_tl[ti].astype(jnp.int32),
                             top_sc > score_thr)

        sf = (scale_factors if scale_factors is not None
              else jnp.ones((b, 4), jnp.float32))
        dets = jax.vmap(single)(tl_p, tl_emb, tl_off, br_p, br_emb, br_off,
                                img_shapes, sf)
        return dets, None
