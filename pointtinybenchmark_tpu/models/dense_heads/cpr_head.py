"""CPRHead — Coarse Point Refinement (CVPR2022), TPU-native.

Parity target: fork models/point/dense_heads/cpr_head.py (1,646 lines).
Behavioral spec re-derived from the reference:

- network (:983-1014): shared stacked convs -> (cls_feat, ins_feat); linear
  cls/ins heads applied to bilinearly-sampled point features
  (`get_pts_outs` :1045-1078); prob via sigmoid/softmax (`get_cls_prob`).
- train (:1101-1229, loss0): positive *bags* are concentric-ring
  neighbourhoods around each annotated point (CirclePtFeatGenerator
  :442-547: radius R rings at r=(i+1)*stride with base_num*(i+1) points,
  center appended last); negatives are grid cell centers farther than
  radius*stride from every (same-class) gt (OutCirclePtFeatGenerator
  :247-293). Losses: MILLoss bag loss + negative gfocal loss (normalized by
  the MIL num_pos) + optional gt-point gfocal loss; `refine_bag_policy` in
  {independent_with_gt_bag, merge_to_gt_bag, only_refine_bag};
  `random_remove_rate` bag-point dropout (:1118-1129).
- inference = annotation refinement (:1231-1283 + PointRefiner :665-866):
  re-extract bags, score, filter (nearest-gt, classify, merge_th,
  gt_alpha * gt_prob, inside image), refined point = confidence-weighted
  mean of kept neighbours, fallback to the original point when
  refine_score < refine_th; outputs 16x16 pseudo-boxes + score + ann_id.

TPU design: everything is batched and static-shape — gts padded to (B, G)
with validity masks, the ring geometry is a compile-time numpy constant,
point sampling is the XLA-gather bilinear kernel (ops/grid_sample, exact
F.grid_sample align_corners=False semantics), the negative mask's
min-distance is a (HW, G) reduction, and the whole train/refine path runs
under one jit. No per-image Python loops (the reference loops images and
levels on host).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.grid_sample import point_sample_pixel
from ...utils.registry import HEADS, LOSSES
from ..utils import ConvModule, bias_init_with_prob

__all__ = ["CPRHead", "CascadeCPRHead", "circle_offsets"]


def circle_offsets(radius: int, base_num_point: int = 8, stride: float = 1.0,
                   start_angle: float = 0.0,
                   same_num_all_radius: bool = False) -> np.ndarray:
    """Ring sampling offsets (reference get_point_neighbours :475-497).

    Returns (num_circle, 2) offsets; ring i (1-based) has radius i*stride and
    base_num_point*(i) points (or base_num_point when same_num_all_radius).
    The annotated center itself is appended by the caller.
    """
    pts = []
    for i in range(radius):
        r = (i + 1) * stride
        n = base_num_point if same_num_all_radius else base_num_point * (i + 1)
        angles = (np.arange(n) / n * 360.0 + start_angle) / 360.0 * 2 * np.pi
        pts.append(np.stack([r * np.cos(angles), r * np.sin(angles)], -1))
    return np.concatenate(pts).astype(np.float32)


def grid_offsets(radius: int, stride: float = 1.0) -> np.ndarray:
    """Grid-cell offsets within `radius` cells (Grid*PtFeatGenerator
    variants — reference cpr_head.py:296-439): every feature-map cell whose
    center lies within radius*stride of the (grid-snapped) annotated point.
    Static stamp; per-gt shape tests (ellipse) are applied as validity."""
    rng = np.arange(-radius, radius + 1, dtype=np.float32)
    dx, dy = np.meshgrid(rng, rng)
    keep = dx ** 2 + dy ** 2 <= radius ** 2 + 1e-6
    return (np.stack([dx[keep], dy[keep]], -1) * stride).astype(np.float32)


@HEADS.register_module()
class CPRHead(nn.Module):
    num_classes: int
    in_channels: int
    feat_channels: int = 256
    stacked_convs: int = 4
    num_cls_fcs: int = 0
    fc_out_channels: int = 1024
    strides: Sequence[int] = (4,)
    norm_cfg: Optional[dict] = None
    ins_share_head_feat: bool = True
    ins_share_head_classifier: bool = False
    loss_mil: Optional[dict] = None
    loss_type: int = 0
    loss_cfg: Optional[dict] = None
    normal_cfg: Optional[dict] = None
    train_pts_extractor: Optional[dict] = None
    refine_pts_extractor: Optional[dict] = None
    point_refiner: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    cascade_stages: int = 1     # >1 = CPR++-style iterative refinement
    dtype: Any = jnp.float32

    needs_gt_in_forward = True  # plain class attr (not a flax field)

    # ---------------------------------------------------------- config
    @property
    def _loss_mil_cfg(self) -> dict:
        return dict(self.loss_mil or dict(type="MILLoss", binary_ins=False,
                                          loss_weight=1.0))

    @property
    def _loss_cfg(self) -> dict:
        base = dict(with_neg=True, neg_loss_weight=1.0,
                    refine_bag_policy="independent_with_gt_bag",
                    random_remove_rate=0.4, with_gt_loss=False,
                    gt_loss_weight=1.0, with_mil_loss=True)
        base.update(dict(self.loss_cfg or {}))
        return base

    @property
    def _normal_cfg(self) -> dict:
        base = dict(prob_cls_type="sigmoid", out_bg_cls=False)
        base.update(dict(self.normal_cfg or {}))
        return base

    @property
    def num_cls_out(self) -> int:
        return self.num_classes + 1 if self._normal_cfg["out_bg_cls"] \
            else self.num_classes

    @property
    def binary_ins(self) -> bool:
        return bool(self._loss_mil_cfg.get("binary_ins", False))

    def _pos_gen_cfg(self, extractor_cfg: Optional[dict]) -> dict:
        cfg = dict((extractor_cfg or {}).get(
            "pos_generator", dict(type="CirclePtFeatGenerator", radius=5)))
        cfg["_type"] = cfg.pop("type", "CirclePtFeatGenerator")
        cfg.setdefault("radius", 5)
        cfg.setdefault("base_num_point", 8)
        cfg.setdefault("start_angle", 0)
        cfg.setdefault("same_num_all_radius", False)
        cfg.setdefault("append_center", True)
        return cfg

    def _neg_gen_cfg(self, extractor_cfg: Optional[dict]) -> dict:
        cfg = dict((extractor_cfg or {}).get(
            "neg_generator", dict(type="OutCirclePtFeatGenerator", radius=3)))
        cfg.pop("type", None)
        cfg.setdefault("radius", 3)
        cfg.setdefault("class_wise", False)
        return cfg

    # ---------------------------------------------------------- network
    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], batch: Dict[str, Any],
                 train: bool = False, mode: str = "train"):
        """Full CPR computation for one mode.

        batch: gt_points (B, G, R, 2) or gt_bboxes (B, G, 4) pseudo boxes,
        gt_labels (B, G), gt_valid (B, G); pad_shape static tuple.

        Returns a dict of point outputs (pos bags + negatives for 'train';
        bag probabilities + geometry for 'refine').
        """
        assert len(feats) == len(self.strides) == 1, \
            "CPR runs on a single FPN level (reference strides=[4])"
        norm = (self.norm_cfg or {}).get("type") if self.norm_cfg else None
        ngroups = (self.norm_cfg or {}).get("num_groups", 32)

        x = feats[0]
        cls_feat = x
        for i in range(self.stacked_convs):
            cls_feat = ConvModule(self.feat_channels, 3, norm=norm,
                                  num_groups=ngroups, dtype=self.dtype,
                                  name=f"cls_conv{i}")(cls_feat, train=train)
        if not self.ins_share_head_feat:
            ins_feat = x
            for i in range(self.stacked_convs):
                ins_feat = ConvModule(self.feat_channels, 3, norm=norm,
                                      num_groups=ngroups, dtype=self.dtype,
                                      name=f"ins_conv{i}")(ins_feat, train=train)
        else:
            ins_feat = cls_feat

        cls_fcs = [nn.Dense(self.fc_out_channels, name=f"cls_fc{i}")
                   for i in range(self.num_cls_fcs)]
        ins_fcs = ([nn.Dense(self.fc_out_channels, name=f"ins_fc{i}")
                    for i in range(self.num_cls_fcs)]
                   if not self.ins_share_head_feat else cls_fcs)
        cls_out = nn.Dense(self.num_cls_out, name="cls_out",
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(
                               bias_init_with_prob(0.01)))
        if not self.ins_share_head_classifier:
            n_ins = self.num_cls_out * 2 if self.binary_ins else self.num_cls_out
            ins_out = nn.Dense(n_ins, name="ins_out",
                               kernel_init=nn.initializers.normal(0.01))
        else:
            ins_out = cls_out

        def head_cls(feat):
            for fc in cls_fcs:
                feat = nn.relu(fc(feat))
            return cls_out(feat)

        def head_ins(feat):
            for fc in ins_fcs:
                feat = nn.relu(fc(feat))
            return ins_out(feat)

        stride = float(self.strides[0])
        pad_shape = batch["pad_shape"]
        b, g, r, _ = batch["gt_points"].shape

        extractor = (self.train_pts_extractor if mode == "train"
                     else self.refine_pts_extractor)
        pos_cfg = self._pos_gen_cfg(extractor)
        gen_type = pos_cfg.get("_type", "CirclePtFeatGenerator")
        grid_gen = gen_type in ("GridPtFeatGenerator",
                                "GridCirclesPtFeatGenerator",
                                "GridEllipsePtFeatGenerator")
        if grid_gen:
            # Grid variants: the bag is actual feature-map cells around the
            # (grid-snapped) point rather than ring offsets. For the
            # ellipse variant the stamp radius bounds the long axis and the
            # exact |p-f1|+|p-f2| <= 2a test is applied per gt below.
            offs = grid_offsets(int(pos_cfg["radius"]), stride)
        else:
            offs = circle_offsets(int(pos_cfg["radius"]),
                                  int(pos_cfg["base_num_point"]), stride,
                                  float(pos_cfg["start_angle"]),
                                  bool(pos_cfg["same_num_all_radius"]))
        if pos_cfg["append_center"]:
            offs = np.concatenate([offs, np.zeros((1, 2), np.float32)])
        nc = offs.shape[0]

        def run_bags(gt_points):
            """Sample circle bags at gt_points and run the point heads."""
            anchors_ = (jnp.round(gt_points / stride) * stride
                        if grid_gen else gt_points)
            bag_pts = anchors_[:, :, :, None, :] + offs[None, None, None]
            if gen_type == "GridEllipsePtFeatGenerator" and \
                    gt_points.shape[2] >= 2:
                # ellipse over the refine-point pair (f1, f2)
                f1 = gt_points[:, :, 0, :]
                f2 = gt_points[:, :, 1, :]
                c = jnp.linalg.norm(f1 - f2, axis=-1) / 2       # (B, G)
                amc = float(pos_cfg.get("a_minus_c", -1.0))
                adc = float(pos_cfg.get("a_divide_c", -1.0))
                a = amc * stride + c if amc >= 0 else adc * c
                d = (jnp.linalg.norm(
                        bag_pts - f1[:, :, None, None, :], axis=-1)
                     + jnp.linalg.norm(
                        bag_pts - f2[:, :, None, None, :], axis=-1))
                in_shape = d <= 2.0 * jnp.maximum(
                    a, stride)[:, :, None, None]
            else:
                in_shape = None
            inside = ((bag_pts[..., 0] >= 0)
                      & (bag_pts[..., 0] < pad_shape[1])
                      & (bag_pts[..., 1] >= 0)
                      & (bag_pts[..., 1] < pad_shape[0]))
            bag_valid = inside & batch["gt_valid"][:, :, None, None]
            if in_shape is not None:
                bag_valid = bag_valid & in_shape
            flat_pts = bag_pts.reshape(b, g * r * nc, 2) / stride
            bag_cls_feats = point_sample_pixel(cls_feat, flat_pts).reshape(
                b, g, r, nc, -1)
            bag_cls_outs = head_cls(bag_cls_feats)
            if self.ins_share_head_feat:
                bag_ins_outs = (bag_cls_outs if self.ins_share_head_classifier
                                else head_ins(bag_cls_feats))
            else:
                bag_ins_feats = point_sample_pixel(
                    ins_feat, flat_pts).reshape(b, g, r, nc, -1)
                bag_ins_outs = head_ins(bag_ins_feats)
            return dict(bag_pts=bag_pts, bag_valid=bag_valid,
                        bag_cls_outs=bag_cls_outs,
                        bag_ins_outs=bag_ins_outs)

        if mode == "cascade_refine":
            # CPR++-style iterative refinement (the reference's
            # CascadeCPRHead exists only as a config reference —
            # SURVEY.md §0): re-extract bags at each stage's refined points.
            pts = batch["gt_points"][:, :, 0, :]            # (B, G, 2)
            not_refine = None
            scores = None
            for _ in range(max(int(self.cascade_stages), 1)):
                hb = dict(batch)
                hb["gt_points"] = pts[:, :, None, :]
                outputs = run_bags(hb["gt_points"])
                pts, scores, nr = self.refine(outputs, hb)
                not_refine = nr if not_refine is None else (not_refine | nr)
            return pts, scores, not_refine

        out = run_bags(batch["gt_points"])

        if mode == "train":
            # negatives: all grid cell centers; the out-of-circle validity
            # mask is computed in loss (needs no params).
            grid_cls_outs = head_cls(cls_feat)        # (B, H, W, num_cls_out)
            out["grid_cls_outs"] = grid_cls_outs
            out["feat_hw"] = cls_feat.shape[1:3]
        return out

    # ------------------------------------------------------- probabilities
    def get_cls_prob(self, cls_out: jnp.ndarray) -> jnp.ndarray:
        t = self._normal_cfg["prob_cls_type"]
        if t == "softmax":
            return jax.nn.softmax(cls_out, axis=-1)
        if t == "sigmoid":
            return jax.nn.sigmoid(cls_out)
        if t == "normed_sigmoid":
            p = jax.nn.sigmoid(cls_out)
            norm = jnp.linalg.norm(
                p, ord=self._normal_cfg.get("normed_sigmoid_p", 1), axis=-1,
                keepdims=True)
            return p / jnp.maximum(norm, 1e-12)
        raise ValueError(t)

    # ----------------------------------------------------------- helpers
    def _grid_centers(self, feat_hw: Tuple[int, int]) -> np.ndarray:
        h, w = feat_hw
        stride = float(self.strides[0])
        xs = (np.arange(w) + 0.5) * stride
        ys = (np.arange(h) + 0.5) * stride
        xx, yy = np.meshgrid(xs, ys)
        return np.stack([xx.ravel(), yy.ravel()], -1).astype(np.float32)

    def _neg_valid(self, grid_pts: np.ndarray, gt_points: jnp.ndarray,
                   gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                   pad_shape, radius: float, class_wise: bool) -> jnp.ndarray:
        """(B, HW, num_cls_out) mask of negative grid points
        (OutCirclePtFeatGenerator :254-290)."""
        stride = float(self.strides[0])
        b, g, r, _ = gt_points.shape
        gts = gt_points.reshape(b, g * r, 2)
        gv = jnp.repeat(gt_valid, r, axis=1)                      # (B, G*R)
        d2 = jnp.sum((grid_pts[None, :, None, :] - gts[:, None, :, :]) ** 2,
                     axis=-1)                                     # (B, HW, G*R)
        d2 = jnp.where(gv[:, None, :], d2, jnp.inf)
        thr2 = (stride * radius) ** 2
        inside = ((grid_pts[:, 0] >= 0) & (grid_pts[:, 0] < pad_shape[1])
                  & (grid_pts[:, 1] >= 0) & (grid_pts[:, 1] < pad_shape[0]))
        if class_wise:
            gl = jnp.repeat(gt_labels, r, axis=1)                 # (B, G*R)
            cls_ids = jnp.arange(self.num_cls_out)
            same = gl[:, None, :, None] == cls_ids[None, None, None, :]
            d2c = jnp.where(same, d2[..., None], jnp.inf)         # (B,HW,G*R,C)
            far = jnp.min(d2c, axis=2) >= thr2                    # (B, HW, C)
        else:
            far = (jnp.min(d2, axis=2) >= thr2)[..., None]
            far = jnp.broadcast_to(far, far.shape[:2] + (self.num_cls_out,))
        return far & inside[None, :, None]

    # -------------------------------------------------------------- loss
    def loss(self, outputs: Dict[str, Any], batch: Dict[str, Any],
             rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
        """loss0 parity (:1131-1229), batched with padding masks."""
        cfg = self._loss_cfg
        loss_mil = LOSSES.build(self._loss_mil_cfg)
        gt_labels = batch["gt_labels"]            # (B, G)
        gt_valid = batch["gt_valid"]
        gt_weights = batch.get("gt_weights")
        if gt_weights is None:
            gt_weights = gt_valid.astype(jnp.float32)

        bag_pts = outputs["bag_pts"]              # (B, G, R, NC, 2)
        bag_valid = outputs["bag_valid"]          # (B, G, R, NC) bool
        bag_cls_outs = outputs["bag_cls_outs"]    # (B, G, R, NC, C)
        bag_ins_outs = outputs["bag_ins_outs"]
        b, g, r, nc, c = bag_cls_outs.shape

        losses: Dict[str, jnp.ndarray] = {}

        # ---- gt (center-point) loss
        if cfg["with_gt_loss"]:
            gt_type = cfg.get("gt_loss_type", "gt_refine")
            gt_cls_outs = bag_cls_outs[..., -1, :]          # (B, G, R, C)
            gt_prob = self.get_cls_prob(gt_cls_outs)
            if gt_type == "gt_refine":
                p = gt_prob.reshape(b * g * r, c)
                lbl = jnp.repeat(gt_labels.reshape(-1), r)
                w = (bag_valid[..., -1].reshape(b * g * r).astype(jnp.float32)
                     * jnp.repeat(gt_weights.reshape(-1), r))
            else:  # 'gt'
                p = gt_prob[:, :, 0].reshape(b * g, c)
                lbl = gt_labels.reshape(-1)
                w = (bag_valid[:, :, 0, -1].reshape(-1).astype(jnp.float32)
                     * gt_weights.reshape(-1))
            onehot = jax.nn.one_hot(lbl, c)
            num_pos_gt = jnp.maximum(jnp.sum(w > 0), 1.0)
            gt_loss = loss_mil.gfocal_loss(p, onehot, w[:, None])
            losses["loss_gt"] = cfg["gt_loss_weight"] * gt_loss.sum() / num_pos_gt

        # ---- bag point dropout (random_remove :1118-1129)
        rrr = float(cfg["random_remove_rate"])
        if rrr > 0 and rng is not None:
            keep = jax.random.uniform(rng, bag_valid.shape) >= rrr
            bag_valid_mil = bag_valid & keep
        else:
            bag_valid_mil = bag_valid

        # ---- MIL bag loss
        num_pos = jnp.asarray(1.0)
        if cfg["with_mil_loss"]:
            policy = cfg["refine_bag_policy"]
            if policy == "independent_with_gt_bag":
                cls_o = bag_cls_outs.reshape(b * g * r, nc, c)
                ins_o = bag_ins_outs.reshape(b * g * r, nc, -1)
                val = bag_valid_mil.reshape(b * g * r, nc, 1)
                lbl = jnp.repeat(gt_labels.reshape(-1), r)
                wts = jnp.repeat(gt_weights.reshape(-1), r)
            elif policy == "merge_to_gt_bag":
                cls_o = bag_cls_outs.reshape(b * g, r * nc, c)
                ins_o = bag_ins_outs.reshape(b * g, r * nc, -1)
                val = bag_valid_mil.reshape(b * g, r * nc, 1)
                lbl = gt_labels.reshape(-1)
                wts = gt_weights.reshape(-1)
            elif policy == "only_refine_bag":
                si = 1 if r > 1 else 0
                cls_o = bag_cls_outs[:, :, si:].reshape(b * g, (r - si) * nc, c)
                ins_o = bag_ins_outs[:, :, si:].reshape(b * g, (r - si) * nc, -1)
                val = bag_valid_mil[:, :, si:].reshape(b * g, (r - si) * nc, 1)
                lbl = gt_labels.reshape(-1)
                wts = gt_weights.reshape(-1)
            else:
                raise ValueError(policy)
            val = val.astype(jnp.float32) * wts[:, None, None]
            cls_prob = self.get_cls_prob(cls_o)
            pos_loss, bag_acc, num_pos = loss_mil(cls_prob, ins_o, lbl, val)
            losses["loss_pos"] = pos_loss
            losses["bag_acc"] = bag_acc

        # ---- negative grid loss
        if cfg["with_neg"]:
            grid_cls_outs = outputs["grid_cls_outs"]     # (B, H, W, C)
            feat_hw = outputs["feat_hw"]
            grid_pts = self._grid_centers(feat_hw)
            neg_cfg = self._neg_gen_cfg(self.train_pts_extractor)
            neg_valid = self._neg_valid(
                grid_pts, outputs["bag_pts"][:, :, :, -1, :], gt_labels,
                gt_valid, batch["pad_shape"], float(neg_cfg["radius"]),
                bool(neg_cfg["class_wise"]))            # (B, HW, C)
            neg_prob = self.get_cls_prob(
                grid_cls_outs.reshape(b, -1, self.num_cls_out))
            neg_labels = jnp.zeros_like(neg_prob)
            neg_loss = loss_mil.gfocal_loss(
                neg_prob.reshape(-1, self.num_cls_out),
                neg_labels.reshape(-1, self.num_cls_out),
                neg_valid.reshape(-1, self.num_cls_out).astype(jnp.float32))
            losses["loss_neg"] = (cfg["neg_loss_weight"] * neg_loss.sum()
                                  / jnp.maximum(num_pos, 1.0))
        return losses

    # ------------------------------------------------------------- refine
    def refine(self, outputs: Dict[str, Any], batch: Dict[str, Any]):
        """PointRefiner parity (:665-866), batched.

        Returns refined points (B, G, 2), scores (B, G), not_refine (B, G).
        """
        cfg = dict(self.point_refiner or {})
        gt_alpha = float(cfg.get("gt_alpha", 0.5))
        merge_th = float(cfg.get("merge_th", 0.05))
        refine_th = float(cfg.get("refine_th", 0.05))
        use_classify = bool(cfg.get("classify_filter", False))
        use_nearest = bool(cfg.get("nearest_filter", True))
        score_type = cfg.get("return_score_type", "mean")

        gt_labels = batch["gt_labels"]
        gt_valid = batch["gt_valid"]
        img_shape = batch["img_shape"]            # (B, 2)
        gt_points = batch["gt_points"]            # (B, G, R, 2)

        bag_pts = outputs["bag_pts"]              # (B, G, R, NC, 2)
        bag_valid = outputs["bag_valid"]          # (B, G, R, NC)
        prob_all = self.get_cls_prob(outputs["bag_cls_outs"])  # (B,G,R,NC,C)
        b, g, r, nc, c = prob_all.shape

        # per-gt class channel
        safe_lbl = jnp.clip(gt_labels, 0, c - 1)
        prob = jnp.take_along_axis(
            prob_all, safe_lbl[:, :, None, None, None], axis=-1)[..., 0]
        gt_prob = prob[..., -1]                   # (B, G, R) — center is last
        merge_valid = bag_valid.reshape(b, g, r * nc)
        prob_flat = prob.reshape(b, g, r * nc)

        if use_nearest:
            # each bag point must be closest to its own gt (among valid
            # same-class gts) — nearest_filter :721-757
            pts = bag_pts.reshape(b, g * r * nc, 2)
            centers = gt_points.reshape(b, g * r, 2)
            d2 = jnp.sum((pts[:, :, None, :] - centers[:, None, :, :]) ** 2,
                         axis=-1)                 # (B, G*R*NC, G*R)
            gv = jnp.repeat(gt_valid, r, axis=1)  # (B, G*R)
            same_cls = (jnp.repeat(gt_labels, r, axis=1)[:, None, :]
                        == jnp.repeat(gt_labels, r, axis=1).reshape(
                            b, g * r)[:, :, None].transpose(0, 2, 1))
            # owner gt of each bag point
            own = jnp.repeat(jnp.arange(g * r), nc)[None, :]      # (1, G*R*NC)
            own_lbl = jnp.repeat(jnp.repeat(gt_labels, r, axis=1), nc, axis=1)
            cand = (gv[:, None, :]
                    & (jnp.repeat(gt_labels, r, axis=1)[:, None, :]
                       == own_lbl[:, :, None]))
            d2 = jnp.where(cand, d2, jnp.inf)
            closest = jnp.argmin(d2, axis=-1)                      # (B, G*R*NC)
            near_ok = (closest == own).reshape(b, g, r * nc)
            merge_valid = merge_valid & near_ok
            del same_cls

        if use_classify:
            cls_ok = (jnp.argmax(prob_all, axis=-1)
                      == safe_lbl[:, :, None, None]).reshape(b, g, r * nc)
            merge_valid = merge_valid & cls_ok

        gt_prob0 = gt_prob[:, :, 0:1]             # (B, G, 1) first refine's gt
        merge_valid = merge_valid & (prob_flat > merge_th) \
            & (prob_flat > gt_prob0 * gt_alpha)

        # inside (unpadded) image
        pts_flat = bag_pts.reshape(b, g, r * nc, 2)
        w_img = img_shape[:, 1].astype(prob.dtype)[:, None, None]
        h_img = img_shape[:, 0].astype(prob.dtype)[:, None, None]
        inside = ((pts_flat[..., 0] >= 0) & (pts_flat[..., 0] < w_img)
                  & (pts_flat[..., 1] >= 0) & (pts_flat[..., 1] < h_img))
        merge_valid = merge_valid & inside

        weighted = prob_flat * merge_valid.astype(prob.dtype)
        wsum = weighted.sum(axis=-1, keepdims=True)
        weight = weighted / (wsum + 1e-8)
        refine_pts = (pts_flat * weight[..., None]).sum(axis=2)   # (B, G, 2)

        count = (weighted > 0).astype(prob.dtype).sum(-1)
        mean_score = weighted.sum(-1) / (count + 1e-8)
        not_refine = mean_score < refine_th
        orig = gt_points[:, :, 0, :]
        refine_pts = jnp.where(not_refine[..., None], orig, refine_pts)

        if score_type == "max":
            scores = weighted.max(-1)
            scores = jnp.where(scores == 0, refine_th / 2, scores)
        else:
            scores = mean_score
        return refine_pts, scores, not_refine

    # --------------------------------------------------- pseudo-box output
    @staticmethod
    def center_to_pseudo_bbox(centers: jnp.ndarray,
                              pseudo_wh=(16, 16)) -> jnp.ndarray:
        wh = jnp.asarray(pseudo_wh, centers.dtype)
        return jnp.concatenate([centers - wh / 2, centers + wh / 2], axis=-1)


@HEADS.register_module()
class CascadeCPRHead(CPRHead):
    """Iterative (cascaded) coarse point refinement — the CPR++ direction.

    The reference's configs2/DOTA/coarsepointv2/cascade_coarse_point_refine_
    ...py references a CascadeCPRHead that is NOT implemented in the
    reference checkout (SURVEY.md §0); this provides the capability: refined
    points from each stage seed the next stage's bags.
    """
    cascade_stages: int = 2
