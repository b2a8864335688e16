"""Assigners: MaxIoU (vectorized, static-shape) and HungarianAssignerV2
(top-k repeated Hungarian matching via a host callback).

Parity targets:
- MaxIoUAssigner: mmdet core/bbox/assigners/max_iou_assigner.py — the
  sequential per-gt low-quality-match loop is re-derived as a vectorized
  "last gt wins" rule (identical result to the reference loop order).
- HungarianAssignerV2: fork core/bbox/assigners/hungarian_assigner.py:149-271
  — configurable cls/reg cost lists, `topk_k` rounds of
  scipy.optimize.linear_sum_assignment over still-unassigned predictions
  (each round assigns one more prediction to every gt while
  #unassigned >= #gts). The GPU->CPU hop in the reference becomes a
  jax.pure_callback; cost computation stays on-device.

Assignment encoding (mmdet convention): -1 = ignore, 0 = negative,
j >= 1 = matched to gt j-1.

All arrays are padded/static; `gt_valid` masks padded gt rows.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
from scipy.optimize import linear_sum_assignment

import jax
import jax.numpy as jnp

from ..utils.registry import BBOX_ASSIGNERS, MATCH_COSTS
from ..ops.gather import take_rows
from ..ops.iou import bbox_overlaps

__all__ = ["MaxIoUAssigner", "HungarianAssignerV2", "topk_hungarian_match",
           "topk_hungarian_match_callback", "topk_auction_match"]

BIG = 1e8


@BBOX_ASSIGNERS.register_module()
class MaxIoUAssigner:
    def __init__(self,
                 pos_iou_thr: float,
                 neg_iou_thr,
                 min_pos_iou: float = 0.0,
                 gt_max_assign_all: bool = True,
                 ignore_iof_thr: float = -1.0,
                 match_low_quality: bool = True,
                 iou_calculator=None):
        self.pos_iou_thr = pos_iou_thr
        self.neg_iou_thr = neg_iou_thr
        self.min_pos_iou = min_pos_iou
        self.gt_max_assign_all = gt_max_assign_all
        self.ignore_iof_thr = ignore_iof_thr
        self.match_low_quality = match_low_quality

    def assign(self,
               bboxes: jnp.ndarray,          # (N, 4)
               gt_bboxes: jnp.ndarray,       # (G, 4) padded
               gt_valid: jnp.ndarray,        # (G,) bool
               gt_labels: Optional[jnp.ndarray] = None,   # (G,) int
               gt_bboxes_ignore: Optional[jnp.ndarray] = None,  # (GI, 4)
               gt_ignore_valid: Optional[jnp.ndarray] = None,
               bbox_valid: Optional[jnp.ndarray] = None,
               overlaps: Optional[jnp.ndarray] = None):
        n = bboxes.shape[0]
        # Padded gt columns get overlap 0 (not -1): anchors with no real gt
        # overlap must become negatives, matching the reference's
        # num_gt==0 -> all-background special case.
        # `overlaps` may be precomputed by the caller (ApproxMaxIoUAssigner
        # semantics: max IoU over the approx group of each square anchor,
        # reference core/bbox/assigners/approx_max_iou_assigner.py:59).
        if overlaps is None:
            overlaps = bbox_overlaps(bboxes, gt_bboxes)      # (N, G)
        overlaps = jnp.where(gt_valid[None, :], overlaps, 0.0)

        max_overlaps = jnp.max(overlaps, axis=1)             # (N,)
        argmax_overlaps = jnp.argmax(overlaps, axis=1)       # (N,)

        assigned = jnp.full((n,), -1, jnp.int32)
        # negatives
        if isinstance(self.neg_iou_thr, (tuple, list)):
            lo, hi = self.neg_iou_thr
            neg = (max_overlaps >= lo) & (max_overlaps < hi)
        else:
            neg = (max_overlaps >= 0) & (max_overlaps < self.neg_iou_thr)
        assigned = jnp.where(neg, 0, assigned)
        # positives
        pos = max_overlaps >= self.pos_iou_thr
        assigned = jnp.where(pos, argmax_overlaps.astype(jnp.int32) + 1, assigned)

        if self.match_low_quality:
            # per-gt max; anchors achieving it get the gt (later gt overrides
            # earlier -> take the largest qualifying gt index per anchor,
            # matching the reference's in-order loop).
            gt_max = jnp.max(overlaps, axis=0)               # (G,)
            if self.gt_max_assign_all:
                cand = (overlaps == gt_max[None, :]) & (gt_max[None, :] >= self.min_pos_iou) \
                       & gt_valid[None, :] & (overlaps > 0)
            else:
                is_gt_argmax = jnp.zeros_like(overlaps, dtype=bool).at[
                    jnp.argmax(overlaps, axis=0), jnp.arange(overlaps.shape[1])].set(True)
                cand = is_gt_argmax & (gt_max[None, :] >= self.min_pos_iou) & gt_valid[None, :]
            g = overlaps.shape[1]
            gt_idx1 = jnp.arange(1, g + 1, dtype=jnp.int32)
            lq = jnp.max(jnp.where(cand, gt_idx1[None, :], 0), axis=1)  # (N,) 0 if none
            assigned = jnp.where(lq > 0, lq, assigned)

        # ignore regions: anchors with IoF vs any ignore region > thr -> -1
        if (gt_bboxes_ignore is not None and self.ignore_iof_thr > 0):
            iof = bbox_overlaps(bboxes, gt_bboxes_ignore, mode="iof")
            if gt_ignore_valid is not None:
                iof = jnp.where(gt_ignore_valid[None, :], iof, -1.0)
            ignore_mask = jnp.max(iof, axis=1) > self.ignore_iof_thr
            assigned = jnp.where(ignore_mask, -1, assigned)

        if bbox_valid is not None:
            assigned = jnp.where(bbox_valid, assigned, -1)

        if gt_labels is not None:
            safe = jnp.clip(assigned - 1, 0, gt_bboxes.shape[0] - 1)
            labels = jnp.where(assigned > 0, take_rows(gt_labels, safe), -1)
        else:
            labels = jnp.full((n,), -1, jnp.int32)
        return assigned, max_overlaps, labels


def _topk_lsa_host(cost: np.ndarray, num_gts: np.ndarray, num_preds: np.ndarray,
                   topk_k: int) -> np.ndarray:
    """Host implementation of the fork's top-k repeated LSA.

    cost: (B, N, G) float32; num_gts/num_preds: (B,) int32.
    Returns assigned (B, N) int32 with 0 = background, j+1 = gt j.
    """
    b, n, g = cost.shape
    out = np.zeros((b, n), np.int32)
    for bi in range(b):
        ng = int(num_gts[bi])
        npred = int(num_preds[bi])
        if ng == 0 or npred == 0:
            continue
        c = cost[bi, :npred, :ng].astype(np.float64)
        c = np.nan_to_num(c, nan=BIG, posinf=BIG, neginf=-BIG)
        assigned = np.zeros(npred, np.int64)
        index = np.nonzero(assigned == 0)[0]
        rounds = 0
        while index.shape[0] // ng != 0 and rounds < topk_k:
            rounds += 1
            sub = c[index]
            rows, cols = linear_sum_assignment(sub)
            assigned[index[rows]] = cols + 1
            index = np.nonzero(assigned == 0)[0]
        out[bi, :npred] = assigned
    return out


def topk_hungarian_match_callback(cost: jnp.ndarray, num_gts: jnp.ndarray,
                                  num_preds: jnp.ndarray, topk_k: int) -> jnp.ndarray:
    """Batched top-k Hungarian via pure_callback (CPU hop, like the
    reference's cost.detach().cpu() at hungarian_assigner.py:230).

    NOTE: the axon TPU PJRT backend does not support host callbacks; this
    path works on CPU/GPU and is kept as the golden reference. On TPU use
    `topk_auction_match` (in-graph)."""
    b, n, _ = cost.shape
    result_shape = jax.ShapeDtypeStruct((b, n), jnp.int32)
    return jax.pure_callback(
        lambda c, ng, npd: _topk_lsa_host(np.asarray(c), np.asarray(ng),
                                          np.asarray(npd), topk_k),
        result_shape, cost.astype(jnp.float32), num_gts, num_preds,
        vmap_method="sequential")


def _auction_round(benefit: jnp.ndarray, pred_taken: jnp.ndarray,
                   eps: float, max_iters: int):
    """One full one-to-one assignment of every valid gt to a distinct pred.

    Reverse auction (Bertsekas): gts (few) bid for preds (many). benefit
    (G, N) with -inf columns for taken/invalid preds and -inf rows for
    invalid gts. Returns owner (N,) int32 = gt index + 1 (0 = unowned).

    eps policy: a single phase from zero prices with a **range-adaptive**
    eps_eff = max(range * 5e-3 / G, eps). Starting from zero prices
    is required for correctness in this asymmetric (G << N) problem: the
    within-G*eps-of-optimum guarantee needs unassigned preds to keep their
    initial price, so classic eps-scaling with price carry-over is NOT
    sound here (phase resets would leave stale prices on unassigned preds
    — verified experimentally to produce large gaps). The single phase
    terminates with a complete eps-CS assignment whose total benefit is
    within G*eps_eff = 0.5% of the cost range of scipy's
    linear_sum_assignment optimum; for costs whose pairwise gaps exceed
    that bound — e.g. any integer costs with range < 200, where the bound
    G*eps_eff = range*5e-3 < 1 is below the gap quantum — the assignment
    cost is exact (ties may break either way). Tie "bidding wars" advance prices by eps_eff per iteration, so
    exactness on tied costs needs max_iters ≳ range/eps_eff = 200*G
    iterations (default 20000 covers G ≤ 100); the cap only binds while
    gts remain unassigned, so typical instances (N >> G, float costs)
    stop after tens of iterations. Any gt still unassigned at the
    iteration cap (adversarial near-tie costs) is completed greedily, so
    every valid gt with a free valid pred always ends up matched — the
    reference's repeated LSA also always returns a full matching
    (hungarian_assigner.py:248-268).
    """
    g, n = benefit.shape
    NEG = jnp.float32(-1e9)
    valid = benefit > NEG
    row_valid = jnp.any(valid, axis=1)  # gts with at least one pred
    vmax = jnp.max(jnp.where(valid, benefit, -jnp.inf))
    vmin = jnp.min(jnp.where(valid, benefit, jnp.inf))
    value_range = vmax - vmin
    value_range = jnp.where(jnp.isfinite(value_range), value_range, 0.0)
    eps_eff = jnp.maximum(value_range * jnp.float32(5e-3 / max(g, 1)),
                          jnp.float32(eps))
    gt_ids = jnp.arange(1, g + 1, dtype=jnp.int32)       # (G,)

    def cond(state):
        it, price, owner, gt_assigned = state
        return (it < max_iters) & jnp.any((~gt_assigned) & row_valid)

    def body(state):
        it, price, owner, gt_assigned = state
        value = benefit - price[None, :]            # (G, N)
        # top-2 per gt row via argmax + masked max: lax.top_k lowers to a
        # full (G, N) sort on TPU — measured 70% of the whole P2P train
        # step (PARITY round-2 profile); two fused reductions instead
        best_idx = jnp.argmax(value, axis=1)         # (G,)
        onehot = best_idx[:, None] == jnp.arange(n)[None, :]   # (G, N)
        best_val = jnp.max(value, axis=1)
        second_val = jnp.max(jnp.where(onehot, -jnp.inf, value), axis=1)
        bid = best_val - second_val + eps_eff        # (G,)
        bidding = (~gt_assigned) & (best_val > NEG)
        # each pred takes its highest bidder (dense one-hot, no scatter)
        bid_amount = jnp.where(bidding, bid, -jnp.inf)  # (G,)
        bids = jnp.where(onehot, bid_amount[:, None], -jnp.inf)
        win_gt = jnp.argmax(bids, axis=0)            # (N,)
        win_bid = jnp.max(bids, axis=0)              # (N,)
        has_bid = win_bid > -jnp.inf
        owner = jnp.where(has_bid, win_gt.astype(jnp.int32) + 1, owner)
        price = jnp.where(has_bid, price + win_bid, price)
        gt_assigned = jnp.any(owner[None, :] == gt_ids[:, None], axis=1)
        return it + 1, price, owner, gt_assigned

    init = (jnp.int32(0), jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.int32), jnp.zeros((g,), bool))
    _, _, owner, _ = jax.lax.while_loop(cond, body, init)

    # greedy completion: any valid gt left unmatched (iteration cap) takes
    # its best still-free valid pred, in gt order — guarantees termination
    # with a full matching like the reference's repeated LSA.
    def complete(i, owner):
        already = jnp.any(owner == i + 1)
        free = (owner == 0) & valid[i]
        best = jnp.argmax(jnp.where(free, benefit[i], -jnp.inf))
        can = row_valid[i] & (~already) & jnp.any(free)
        return owner.at[best].set(
            jnp.where(can, jnp.int32(i + 1), owner[best]))

    owner = jax.lax.fori_loop(0, g, complete, owner)
    return owner


def topk_auction_match(cost: jnp.ndarray, gt_valid: jnp.ndarray,
                       topk_k: int, eps: float = 1e-4,
                       max_iters: int = 20000) -> jnp.ndarray:
    """In-graph batched top-k assignment (TPU-native Hungarian replacement).

    Args:
        cost: (B, N, G) — prediction x gt cost.
        gt_valid: (B, G) bool.
        topk_k: rounds; each round matches every valid gt to one more
            distinct prediction (fork hungarian_assigner.py:248-268).
    Returns:
        assigned (B, N) int32: 0 background, j+1 matched to gt j.
    """
    NEG = jnp.float32(-1e9)

    def one(c, gv):
        n, g = c.shape
        benefit0 = jnp.where(gv[:, None], -c.T, NEG)  # (G, N)

        def round_body(_, carry):
            assigned, pred_taken = carry
            benefit = jnp.where(pred_taken[None, :], NEG, benefit0)
            benefit = jnp.where(gv[:, None], benefit, NEG)
            owner = _auction_round(benefit, pred_taken, eps, max_iters)
            newly = (owner > 0) & (~pred_taken)
            assigned = jnp.where(newly, owner, assigned)
            pred_taken = pred_taken | newly
            return assigned, pred_taken

        assigned = jnp.zeros((n,), jnp.int32)
        pred_taken = jnp.zeros((n,), bool)
        assigned, _ = jax.lax.fori_loop(0, topk_k, round_body,
                                        (assigned, pred_taken))
        return assigned

    return jax.vmap(one)(cost.astype(jnp.float32), gt_valid)


def topk_hungarian_match(cost: jnp.ndarray, num_gts: jnp.ndarray,
                         num_preds: jnp.ndarray, topk_k: int) -> jnp.ndarray:
    """Default matcher: in-graph auction (works on every backend)."""
    g = cost.shape[2]
    gt_valid = jnp.arange(g)[None, :] < num_gts[:, None]
    return topk_auction_match(cost, gt_valid, topk_k)


@BBOX_ASSIGNERS.register_module()
class HungarianAssignerV2:
    """Fork's one-to-many point matcher (hungarian_assigner.py:149-271)."""

    def __init__(self, cls_costs=None, reg_costs=None, topk_k: int = 1):
        if cls_costs is None:
            cls_costs = [dict(type="ClassificationCost", weight=1.0)]
        if reg_costs is None:
            reg_costs = [dict(type="BBoxL1Cost", weight=1.0),
                         dict(type="IoUCost", iou_mode="giou", weight=1.0)]
        cls_costs = cls_costs if isinstance(cls_costs, (list, tuple)) else [cls_costs]
        reg_costs = reg_costs if isinstance(reg_costs, (list, tuple)) else [reg_costs]
        self.cls_costs = [MATCH_COSTS.build(dict(c)) for c in cls_costs]
        self.reg_costs = [MATCH_COSTS.build(dict(c)) for c in reg_costs]
        self.topk_k = topk_k

    def cost_matrix(self, bbox_pred, cls_pred, gt_bboxes, gt_labels, img_meta,
                    gt_valid):
        cost = sum(c(cls_pred, gt_labels) for c in self.cls_costs) \
            + sum(c(bbox_pred, gt_bboxes, img_meta) for c in self.reg_costs)
        # invalid gt columns can't win a match
        return jnp.where(gt_valid[None, :], cost, BIG)

    def assign_batch(self, bbox_preds, cls_preds, gt_bboxes, gt_labels,
                     img_metas, gt_valid):
        """Batched assignment.

        Args:
            bbox_preds: (B, N, 2k)  cls_preds: (B, N, C)
            gt_bboxes: (B, G, 2k)  gt_labels: (B, G)  gt_valid: (B, G) bool
            img_metas: dict of batched arrays with key "img_shape" (B, 2+).
        Returns:
            assigned (B, N) int32 (0 bg, j+1 fg), labels (B, N) int32.
        """
        b, n = bbox_preds.shape[:2]

        def one(bp, cp, gb, gl, gv, shape):
            meta = {"img_shape": shape}
            return self.cost_matrix(bp, cp, gb, gl, meta, gv)

        cost = jax.vmap(one)(bbox_preds, cls_preds, gt_bboxes, gt_labels,
                             gt_valid, img_metas["img_shape"])
        num_gts = jnp.sum(gt_valid.astype(jnp.int32), axis=1)
        num_preds = jnp.full((b,), n, jnp.int32)
        assigned = topk_hungarian_match(cost, num_gts, num_preds, self.topk_k)
        safe = jnp.clip(assigned - 1, 0, gt_bboxes.shape[1] - 1)
        labels = jnp.where(assigned > 0,
                           jnp.take_along_axis(gt_labels, safe, axis=1), -1)
        return assigned, labels


@BBOX_ASSIGNERS.register_module()
class CenterRegionAssigner:
    """Center-region assigner (mmdet core/bbox/assigners/
    center_region_assigner.py — FoveaBox-style scale-adaptive regions).

    A box is positive for a gt when its center lies inside the gt's
    `pos_scale`-shrunk central region; boxes inside the `neg_scale` region
    of any gt but positive for none are ignored (-1). Ties between gts go
    to the smallest-area gt (the reference's sort-by-area priority),
    resolved here with a masked argmin instead of a python sort.
    """

    def __init__(self, pos_scale: float = 0.2, neg_scale: float = 0.2,
                 min_pos_iof: float = 1e-2, ignore_gt_scale: float = 0.5,
                 iou_calculator=None):
        self.pos_scale = pos_scale
        self.neg_scale = neg_scale
        self.min_pos_iof = min_pos_iof
        self.ignore_gt_scale = ignore_gt_scale

    def assign(self, bboxes: jnp.ndarray, gt_bboxes: jnp.ndarray,
               gt_valid: jnp.ndarray,
               gt_labels: Optional[jnp.ndarray] = None,
               gt_bboxes_ignore: Optional[jnp.ndarray] = None,
               gt_ignore_valid: Optional[jnp.ndarray] = None,
               bbox_valid: Optional[jnp.ndarray] = None,
               overlaps: Optional[jnp.ndarray] = None):
        n = bboxes.shape[0]
        g = gt_bboxes.shape[0]
        cx = (bboxes[:, 0] + bboxes[:, 2]) * 0.5
        cy = (bboxes[:, 1] + bboxes[:, 3]) * 0.5

        def region(scale):
            gcx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
            gcy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
            hw = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * scale * 0.5
            hh = (gt_bboxes[:, 3] - gt_bboxes[:, 1]) * scale * 0.5
            inside = ((cx[:, None] >= (gcx - hw)[None, :])
                      & (cx[:, None] <= (gcx + hw)[None, :])
                      & (cy[:, None] >= (gcy - hh)[None, :])
                      & (cy[:, None] <= (gcy + hh)[None, :]))
            return inside & gt_valid[None, :]

        pos_cand = region(self.pos_scale)                    # (N, G)
        ign_cand = region(self.neg_scale)
        area = ((gt_bboxes[:, 2] - gt_bboxes[:, 0])
                * (gt_bboxes[:, 3] - gt_bboxes[:, 1]))
        area_m = jnp.where(pos_cand, area[None, :], jnp.inf)
        best = jnp.argmin(area_m, axis=1)
        has_pos = jnp.any(pos_cand, axis=1)
        assigned = jnp.where(has_pos, best + 1, 0)
        ignored = jnp.any(ign_cand, axis=1) & ~has_pos
        assigned = jnp.where(ignored, -1, assigned).astype(jnp.int32)
        if bbox_valid is not None:
            assigned = jnp.where(bbox_valid, assigned, -1)
        safe = jnp.clip(assigned - 1, 0, g - 1)
        labels = (jnp.where(assigned > 0, gt_labels[safe], -1)
                  if gt_labels is not None
                  else jnp.full((n,), -1, jnp.int32))
        max_ov = has_pos.astype(jnp.float32)
        return assigned, max_ov, labels
