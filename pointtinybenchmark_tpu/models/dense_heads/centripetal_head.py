"""CentripetalHead — CentripetalNet corner pairing (arXiv 2003.09119).

Parity target: mmdet models/dense_heads/centripetal_head.py — CornerHead
whose associative embeddings are replaced by **centripetal shifts**: each
corner regresses (in log space) a vector pointing at the box center; a
(tl, br) pair is kept when both shifted centers fall inside the candidate
box's mu-scaled central region. A *guiding shift* supervises an intermediate
offset field that steers feature adaption on the corner features (the
reference uses DeformConv driven by the guiding shift).

TPU design: feature adaption = bilinear re-sampling of the corner feature at
`position + guiding_shift` (`ops/grid_sample.point_sample_pixel`) followed by
a 3x3 conv — the same gather-based replacement used for GuidedAnchoring's
FeatureAdaption; the pairwise decode is the CornerHead static (K, K)
program with the centripetal gate instead of the embedding gate.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.post_processing import DetResult
from ...ops.grid_sample import point_sample_pixel
from ...utils.registry import HEADS
from .centernet_head import GaussianFocalLoss
from .corner_head import CornerHead, corner_pool

__all__ = ["CentripetalHead"]


@HEADS.register_module()
class CentripetalHead(CornerHead):
    centripetal_shift_channels: int = 2
    guiding_shift_channels: int = 2

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[-1]

        def branch(name, pool_a, pool_b):
            a = nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                                dtype=self.dtype, name=f"{name}_pa")(x))
            b_ = nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                                 dtype=self.dtype, name=f"{name}_pb")(x))
            p = corner_pool(a, pool_a) + corner_pool(b_, pool_b)
            p = nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                                dtype=self.dtype, name=f"{name}_fuse")(p))

            def head(src, out_ch, hname, bias=0.0):
                y = nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                                    dtype=self.dtype,
                                    name=f"{name}_{hname}_c")(src))
                return nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                               bias_init=nn.initializers.constant(bias),
                               name=f"{name}_{hname}_out")(y)

            hm = head(p, self.num_classes, "hm", bias=-2.19)
            off = head(p, 2, "off")
            guiding = head(p, self.guiding_shift_channels, "guiding")
            # feature adaption: resample p at (pos + guiding shift), conv
            bsz, h, w, c = p.shape
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32),
                                  indexing="ij")
            px = gx[None] + jax.lax.stop_gradient(guiding[..., 0])
            py = gy[None] + jax.lax.stop_gradient(guiding[..., 1])
            pts = jnp.stack([px, py], -1).reshape(bsz, h * w, 2)
            adapted = point_sample_pixel(p, pts).reshape(bsz, h, w, c)
            adapted = nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                                      dtype=self.dtype,
                                      name=f"{name}_adapt")(adapted))
            centripetal = head(adapted, self.centripetal_shift_channels,
                               "centripetal")
            return hm, off, guiding, centripetal

        tl = branch("tl", "top", "left")
        br = branch("br", "bottom", "right")
        return tl, br

    # ---------------------------------------------------------------- loss
    def loss(self, tl, br, batch: Dict[str, Any], rng=None):
        tl_hm, tl_off, tl_guid, tl_cent = tl
        br_hm, br_off, br_guid, br_cent = br
        b, h, w, _ = tl_hm.shape
        s = float(self.stride)
        gfl = GaussianFocalLoss()

        def single(tl_hm_s, tl_off_s, tl_g_s, tl_c_s,
                   br_hm_s, br_off_s, br_g_s, br_c_s, gtb, gtl, gv):
            gt_w = gtb[:, 2] - gtb[:, 0]
            gt_h = gtb[:, 3] - gtb[:, 1]
            cx = (gtb[:, 0] + gtb[:, 2]) / 2
            cy = (gtb[:, 1] + gtb[:, 3]) / 2
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
            gvf = gv.astype(jnp.float32)
            # shift targets at the corner pixels (feature-map units)
            tl_tgt = jnp.stack([(cx - gtb[:, 0]) / s,
                                (cy - gtb[:, 1]) / s], -1)  # positive
            br_tgt = jnp.stack([(gtb[:, 2] - cx) / s,
                                (gtb[:, 3] - cy) / s], -1)
            log_tl = jnp.log(jnp.maximum(tl_tgt, 1e-4))
            log_br = jnp.log(jnp.maximum(br_tgt, 1e-4))

            def shift_loss(field, pix, tgt):
                pred = field.reshape(h * w, -1)[pix]
                return (jnp.abs(pred - tgt).sum(-1) * gvf).sum() / num_pos

            l_guid = shift_loss(tl_g_s, t_pix, tl_tgt) \
                + shift_loss(br_g_s, b_pix, br_tgt)
            l_cent = shift_loss(tl_c_s, t_pix, log_tl) \
                + shift_loss(br_c_s, b_pix, log_br)
            return l_hm, l_off, l_guid, l_cent, gv.sum().astype(jnp.float32)

        l_hm, l_off, l_guid, l_cent, npos = jax.vmap(single)(
            tl_hm, tl_off, tl_guid, tl_cent, br_hm, br_off, br_guid,
            br_cent, batch["gt_bboxes"], batch["gt_labels"],
            batch["gt_valid"])
        # loss weights: guiding 0.05, centripetal 1.0 (centripetal_head cfg)
        return {"loss_heatmap": l_hm.mean(),
                "loss_offset": l_off.mean(),
                "loss_guiding_shift": 0.05 * l_guid.mean(),
                "loss_centripetal_shift": l_cent.mean(),
                "num_pos": npos.sum()}

    # ------------------------------------------------------------ inference
    def get_bboxes(self, tl, br, img_shapes, pad_shape, scale_factors=None,
                   rescale: bool = False):
        cfg = self.test_cfg or {}
        k = int(cfg.get("corner_topk", 32))
        max_per_img = int(cfg.get("max_per_img", 100))
        score_thr = float(cfg.get("score_thr", 0.05))
        mu = float(cfg.get("centripetal_mu", 2.1 / 2.4))  # central-region mu
        tl_hm, tl_off, _, tl_cent = tl
        br_hm, br_off, _, br_cent = br
        b, h, w, c = tl_hm.shape
        s = float(self.stride)

        def nms_hm(x):
            m = nn.max_pool(x, (3, 3), strides=(1, 1),
                            padding=((1, 1), (1, 1)))
            return jnp.where(x == m, x, 0.0)

        tl_p = nms_hm(jax.nn.sigmoid(tl_hm))
        br_p = nms_hm(jax.nn.sigmoid(br_hm))

        def topk_corners(hm, off, cent):
            flat = hm.transpose(2, 0, 1).reshape(-1)
            sc, idx = jax.lax.top_k(flat, k)
            ci = idx // (h * w)
            pix = idx % (h * w)
            py = (pix // w).astype(jnp.float32)
            px = (pix % w).astype(jnp.float32)
            o = off.reshape(-1, 2)[pix]
            ct = jnp.exp(cent.reshape(-1, 2)[pix]) * s   # image-pixel shift
            return (sc, ci, (px + o[:, 0]) * s, (py + o[:, 1]) * s,
                    ct[:, 0], ct[:, 1])

        def single(tl_p_s, tl_o_s, tl_c_s, br_p_s, br_o_s, br_c_s,
                   img_shape, scale_factor):
            s_tl, c_tl, x_tl, y_tl, sx_tl, sy_tl = topk_corners(
                tl_p_s, tl_o_s, tl_c_s)
            s_br, c_br, x_br, y_br, sx_br, sy_br = topk_corners(
                br_p_s, br_o_s, br_c_s)
            score = (s_tl[:, None] + s_br[None, :]) / 2      # (K, K)
            # candidate box geometry
            bw = x_br[None, :] - x_tl[:, None]
            bh = y_br[None, :] - y_tl[:, None]
            # mu-central region of the candidate box
            ctx1 = x_tl[:, None] + bw * (1 - mu) / 2
            ctx2 = x_br[None, :] - bw * (1 - mu) / 2
            cty1 = y_tl[:, None] + bh * (1 - mu) / 2
            cty2 = y_br[None, :] - bh * (1 - mu) / 2
            # shifted centers
            tcx = x_tl[:, None] + sx_tl[:, None]
            tcy = y_tl[:, None] + sy_tl[:, None]
            bcx = x_br[None, :] - sx_br[None, :]
            bcy = y_br[None, :] - sy_br[None, :]
            ok = (c_tl[:, None] == c_br[None, :]) & (bw > 0) & (bh > 0) \
                & (tcx >= ctx1) & (tcx <= ctx2) \
                & (tcy >= cty1) & (tcy <= cty2) \
                & (bcx >= ctx1) & (bcx <= ctx2) \
                & (bcy >= cty1) & (bcy <= cty2)
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
        dets = jax.vmap(single)(tl_p, tl_off, tl_cent, br_p, br_off,
                                br_cent, img_shapes, sf)
        return dets, None
