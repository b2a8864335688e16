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

__all__ = ["nms", "batched_nms", "nms_mask"]

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
    return nms(shifted, scores, iou_threshold, max_out, valid_mask, score_threshold)


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
             max_out: int, valid_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Return an (N,) bool keep-mask instead of gather indices."""
    keep_idx, _ = nms(boxes, scores, iou_threshold, max_out, valid_mask)
    n = boxes.shape[0]
    mask = jnp.zeros((n,), dtype=bool)
    safe = jnp.where(keep_idx >= 0, keep_idx, 0)
    updates = keep_idx >= 0
    return mask.at[safe].max(updates)
