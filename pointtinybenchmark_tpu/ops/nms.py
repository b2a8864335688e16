"""TPU-native NMS: exact greedy suppression with static shapes.

Parity target: mmcv.ops.nms / batched_nms as used by the reference
(TOV_mmdetection/mmdet/core/post_processing/bbox_nms.py, merge_augs.py,
models/detectors/two_stage.py:245 tile merge). The CUDA kernel is replaced
by an XLA pick-loop: each step selects the highest remaining score and
suppresses overlapped boxes — O(max_out * N) vector work, no host round-trip,
fixed output shape (`max_out` indices padded with -1).

Greedy semantics are exact: identical keep-set to the sequential CPU/CUDA
algorithm for any fixed tie-breaking by score order.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["nms", "nms_fixpoint", "nms_blocked", "nms_vblocked",
           "batched_nms", "batched_nms_large", "nms_mask"]

NEG_INF = jnp.float32(-1e30)


@partial(jax.jit, static_argnames=("max_out",))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        max_out: int, valid_mask: Optional[jnp.ndarray] = None,
        score_threshold: float = float("-inf")) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS.

    Args:
        boxes: (N, 4) xyxy.
        scores: (N,).
        iou_threshold: suppression IoU threshold.
        max_out: static output budget.
        valid_mask: (N,) bool; padded rows to ignore.
        score_threshold: drop boxes at or below this score.
    Returns:
        keep_idx: (max_out,) int32 indices into the input, -1-padded.
        num_kept: () int32.
    """
    n = boxes.shape[0]
    scores = scores.astype(jnp.float32)
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, NEG_INF)
    scores = jnp.where(scores > score_threshold, scores, NEG_INF)

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)

    def body(step, state):
        rem_scores, keep_idx, num_kept = state
        i = jnp.argmax(rem_scores)
        ok = rem_scores[i] > NEG_INF
        keep_idx = keep_idx.at[step].set(jnp.where(ok, i.astype(jnp.int32), -1))
        num_kept = num_kept + ok.astype(jnp.int32)
        # IoU of the picked box against all remaining boxes.
        ix1 = jnp.maximum(x1[i], x1)
        iy1 = jnp.maximum(y1[i], y1)
        ix2 = jnp.minimum(x2[i], x2)
        iy2 = jnp.minimum(y2[i], y2)
        inter = jnp.clip(ix2 - ix1, 0, None) * jnp.clip(iy2 - iy1, 0, None)
        union = jnp.maximum(areas[i] + areas - inter, 1e-6)
        iou = inter / union
        suppress = ok & (iou > iou_threshold)
        suppress = suppress.at[i].set(ok)  # remove the pick itself
        rem_scores = jnp.where(suppress, NEG_INF, rem_scores)
        return rem_scores, keep_idx, num_kept

    keep_idx0 = jnp.full((max_out,), -1, dtype=jnp.int32)
    _, keep_idx, num_kept = jax.lax.fori_loop(
        0, min(max_out, n), body, (scores, keep_idx0, jnp.int32(0)))
    return keep_idx, num_kept


@partial(jax.jit, static_argnames=("max_out",))
def nms_fixpoint(boxes: jnp.ndarray, scores: jnp.ndarray,
                 iou_threshold: float, max_out: int,
                 valid_mask: Optional[jnp.ndarray] = None,
                 score_threshold: float = float("-inf")
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS via parallel fixpoint iteration.

    The greedy keep-set is the unique solution of
        keep[i] = not any_{j<i, score-sorted}(keep[j] and iou(j,i) > thr);
    Jacobi-iterating this system from all-True converges to that solution in
    O(longest suppression chain) rounds (typically < 16 for detection
    workloads) — each round one (N, N) masked matmul-like reduction on the
    VPU instead of N sequential argmax steps. ~10-50x faster than the
    pick-loop for N in the low thousands; O(N^2) memory, so callers route to
    the pick-loop above this size (see batched_nms).
    """
    n = boxes.shape[0]
    scores = scores.astype(jnp.float32)
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, NEG_INF)
    scores = jnp.where(scores > score_threshold, scores, NEG_INF)
    ok = scores > NEG_INF

    order = jnp.argsort(-scores)
    b = boxes[order]
    ok_s = ok[order]
    keep = _fixpoint_sorted(b, ok_s, iou_threshold)
    num_kept = jnp.minimum(keep.sum().astype(jnp.int32), max_out)
    # top max_out kept, in score order (k clamped when fewer candidates)
    rank_score = jnp.where(keep, scores[order], NEG_INF)
    k = min(max_out, n)
    _, kept_pos = jax.lax.top_k(rank_score, k)
    kept_valid = jnp.take(keep, kept_pos)
    keep_idx = jnp.where(kept_valid, order[kept_pos], -1).astype(jnp.int32)
    if k < max_out:
        keep_idx = jnp.concatenate(
            [keep_idx, jnp.full((max_out - k,), -1, jnp.int32)])
    return keep_idx, num_kept


# fixpoint path is used below this candidate count (N^2 memory bound)
FIXPOINT_MAX_N = 4096
# blocked-fixpoint block width above that (N x BLOCK transients)
NMS_BLOCK = 2048


def _pairwise_iou(a, b):
    """(Na, 4) x (Nb, 4) -> (Na, Nb)."""
    ix1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.clip(ix2 - ix1, 0, None) * jnp.clip(iy2 - iy1, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter,
                               1e-6)


def _fixpoint_sorted(b, ok_s, iou_threshold):
    """Greedy keep-set for score-DESC-sorted boxes via Jacobi fixpoint
    (see nms_fixpoint). ok_s rows that are False never keep/suppress."""
    n = b.shape[0]
    iou = _pairwise_iou(b, b)
    tri = jnp.tril(jnp.ones((n, n), bool), k=-1)  # j < i (rows j, cols i)
    sup = (iou > iou_threshold) & tri.T & ok_s[:, None] & ok_s[None, :]

    def cond(state):
        keep, changed, it = state
        return changed & (it < n)

    def body(state):
        keep, _, it = state
        new_keep = ok_s & ~jnp.any(sup & keep[:, None], axis=0)
        return new_keep, jnp.any(new_keep != keep), it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (ok_s, jnp.asarray(True), jnp.int32(0)))
    return keep


@partial(jax.jit, static_argnames=("max_out", "block"))
def nms_blocked(boxes: jnp.ndarray, scores: jnp.ndarray,
                iou_threshold: float, max_out: int,
                valid_mask: Optional[jnp.ndarray] = None,
                score_threshold: float = float("-inf"),
                block: int = NMS_BLOCK) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS for large N without the O(N^2) matrix or the
    O(max_out) sequential pick-loop.

    Score-sorted boxes are processed in `block`-wide chunks: a chunk's
    boxes are first suppressed by the KEPT boxes of all earlier chunks
    (one (prefix, block) IoU pass — greedy suppression only ever comes
    from kept boxes), then the chunk is resolved internally with the
    Jacobi fixpoint. Identical keep-set to the sequential algorithm;
    a handful of large VPU ops instead of max_out tiny dispatch-bound
    steps (the 12k-box global tile-merge was pick-loop-bound,
    PARITY round-2 NMS notes).
    """
    n = boxes.shape[0]
    scores = scores.astype(jnp.float32)
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, NEG_INF)
    scores = jnp.where(scores > score_threshold, scores, NEG_INF)
    ok = scores > NEG_INF

    n_pad = ((n + block - 1) // block) * block
    pad = n_pad - n
    order = jnp.argsort(-scores)
    b = jnp.pad(boxes[order], ((0, pad), (0, 0)))
    ok_s = jnp.pad(ok[order], (0, pad))

    keep = jnp.zeros((n_pad,), bool)
    for bi in range(n_pad // block):
        lo = bi * block
        blk = jax.lax.dynamic_slice_in_dim(b, lo, block)
        ok_blk = jax.lax.dynamic_slice_in_dim(ok_s, lo, block)
        if bi > 0:
            prev_b = b[:lo]
            prev_keep = keep[:lo]
            cross = _pairwise_iou(blk, prev_b) > iou_threshold
            pre_sup = jnp.any(cross & prev_keep[None, :], axis=1)
            ok_blk = ok_blk & ~pre_sup
        keep_blk = _fixpoint_sorted(blk, ok_blk, iou_threshold)
        keep = jax.lax.dynamic_update_slice_in_dim(keep, keep_blk, lo, 0)

    keep = keep[:n_pad - pad] if pad else keep
    sorted_scores = jnp.pad(scores[order], (0, pad))[:n_pad - pad] \
        if pad else scores[order]
    num_kept = jnp.minimum(keep.sum().astype(jnp.int32), max_out)
    rank_score = jnp.where(keep, sorted_scores, NEG_INF)
    k = min(max_out, n)
    _, kept_pos = jax.lax.top_k(rank_score, k)
    kept_valid = jnp.take(keep, kept_pos)
    keep_idx = jnp.where(kept_valid, order[kept_pos], -1).astype(jnp.int32)
    if k < max_out:
        keep_idx = jnp.concatenate(
            [keep_idx, jnp.full((max_out - k,), -1, jnp.int32)])
    return keep_idx, num_kept


@partial(jax.jit, static_argnames=("max_out", "block"))
def nms_vblocked(boxes: jnp.ndarray, scores: jnp.ndarray,
                 iou_threshold: float, max_out: int,
                 valid_mask: Optional[jnp.ndarray] = None,
                 score_threshold: float = float("-inf"),
                 block: int = 256) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS for large N that stays fast UNDER VMAP.

    The pick-loop (`nms`) runs max_out sequential argmax steps — 1000
    rounds of tiny vector work that dominated protocol inference (14.7
    ms/img of the 45 ms step, round-5 on-chip breakdown). `nms_blocked`
    fixes that un-vmapped but its (block x N-prefix) transients and
    per-chunk while_loops multiply under vmap (OOM at B=24 tiles).

    This variant picks `block` boxes per round instead of one:
      - the top-`block` REMAINING candidates by score are exactly the
        next `block` boxes sequential greedy would examine, in order;
      - their keep-set depends only on higher-scored kept boxes, i.e. on
        each other (everything kept earlier has already suppressed the
        pool) -> one `block`-sized Jacobi fixpoint resolves them exactly;
      - one (N, block) IoU pass suppresses the pool, the block leaves
        the pool, repeat.
    O(ceil(picked/block)) rounds of large VPU ops; transients are
    (N, block) per lane — vmap-safe at protocol shape (24 x 10k x 128).
    Identical keep-set + order to the sequential algorithm (ties resolve
    by index through top_k, same as argmax).
    """
    n = boxes.shape[0]
    scores = scores.astype(jnp.float32)
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, NEG_INF)
    scores = jnp.where(scores > score_threshold, scores, NEG_INF)
    k = min(block, n)

    def cond(state):
        rem_scores, keep_idx, num_kept, it = state
        more = rem_scores[jnp.argmax(rem_scores)] > NEG_INF
        return (num_kept < max_out) & more & (it * k < n + k)

    def body(state):
        rem_scores, keep_idx, num_kept, it = state
        top_s, top_i = jax.lax.top_k(rem_scores, k)
        tb = boxes[top_i]
        ok_s = top_s > NEG_INF
        keep_blk = _fixpoint_sorted(tb, ok_s, iou_threshold)     # (k,)
        # append kept picks in score order at positions num_kept..
        pos = jnp.cumsum(keep_blk) - 1 + num_kept
        in_range = keep_blk & (pos < max_out)
        keep_idx = keep_idx.at[jnp.where(in_range, pos, max_out)].set(
            jnp.where(in_range, top_i.astype(jnp.int32), -1), mode="drop")
        num_kept = num_kept + in_range.sum(dtype=jnp.int32)
        # pool suppression by this round's kept boxes + retire the block
        iou = _pairwise_iou(boxes, tb)                           # (N, k)
        sup = jnp.any((iou > iou_threshold) & keep_blk[None, :], axis=1)
        rem_scores = jnp.where(sup, NEG_INF, rem_scores)
        rem_scores = rem_scores.at[top_i].set(NEG_INF)
        return rem_scores, keep_idx, num_kept, it + 1

    keep_idx0 = jnp.full((max_out,), -1, dtype=jnp.int32)
    _, keep_idx, num_kept, _ = jax.lax.while_loop(
        cond, body, (scores, keep_idx0, jnp.int32(0), jnp.int32(0)))
    return keep_idx, num_kept


@partial(jax.jit, static_argnames=("max_out",))
def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, idxs: jnp.ndarray,
                iou_threshold: float, max_out: int,
                valid_mask: Optional[jnp.ndarray] = None,
                score_threshold: float = float("-inf")) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS via the coordinate-offset trick (mmcv batched_nms parity).

    Boxes of different `idxs` (class or tile group) never suppress each other.
    """
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    if boxes.shape[0] <= FIXPOINT_MAX_N:
        return nms_fixpoint(shifted, scores, iou_threshold, max_out,
                            valid_mask, score_threshold)
    # Above the fixpoint bound: nms_vblocked — exact greedy in
    # O(picked/block) rounds of large VPU ops with vmap-safe (N, block)
    # transients. Replaces the max_out-step pick-loop that cost 14.7
    # ms/img at protocol shape (the blocked-prefix variant OOM'd under
    # vmap at B=24 and serialized badly — see nms_vblocked docstring;
    # un-vmapped large-N callers like the global tile merge use
    # batched_nms_large below).
    return nms_vblocked(shifted, scores, iou_threshold, max_out,
                        valid_mask, score_threshold)


@partial(jax.jit, static_argnames=("max_out",))
def batched_nms_large(boxes: jnp.ndarray, scores: jnp.ndarray,
                      idxs: jnp.ndarray, iou_threshold: float, max_out: int,
                      valid_mask: Optional[jnp.ndarray] = None,
                      score_threshold: float = float("-inf")
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware exact NMS for large N at UN-VMAPPED call sites (the
    global cross-tile merge): offset trick + nms_blocked — 2.1x faster
    than the pick-loop at N=12k (5.5 vs 11.7 ms on v5e). Do NOT call
    under vmap; use batched_nms there (see routing note above)."""
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    if boxes.shape[0] <= FIXPOINT_MAX_N:
        return nms_fixpoint(shifted, scores, iou_threshold, max_out,
                            valid_mask, score_threshold)
    return nms_blocked(shifted, scores, iou_threshold, max_out, valid_mask,
                       score_threshold)


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
             max_out: int, valid_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Return an (N,) bool keep-mask instead of gather indices."""
    keep_idx, _ = nms(boxes, scores, iou_threshold, max_out, valid_mask)
    n = boxes.shape[0]
    mask = jnp.zeros((n,), dtype=bool)
    safe = jnp.where(keep_idx >= 0, keep_idx, 0)
    updates = keep_idx >= 0
    return mask.at[safe].max(updates)
