"""TPU-fast row gathers from SMALL tables via one-hot contraction.

The padded-GT discipline (SURVEY §7.1) makes every target-assignment step
gather per-anchor rows from a tiny (G<=few hundred) gt table with a huge
(N~250k) index vector — `gt_bboxes[assigned_idx]`. XLA lowers that dynamic
gather to a serial row-at-a-time loop on TPU: on the RetinaNet-c protocol
train step (B=8, N=245520, G=50) the two such gathers (labels + bbox
targets) ran 21.4 ms/step at ~3 GB/s effective — 23% of the whole step
(trace: fusion.6/fusion.7, round 4).

The TPU-native form is a one-hot matmul: build the (N, G) one-hot of the
index and contract it with the (G, K) table on the MXU. FLOPs are trivial
(2*N*G*K ~ 0.8 GFLOP here) and the traffic is one (N, G) f32 write+read
instead of N serial row fetches. `precision=HIGHEST` keeps the f32 table
values exact (one-hot entries are exactly 0/1, so the contraction is a
selection, not an approximation); integer/bool tables round-trip exactly
through f32 for values < 2^24.

Reference role: `torch.Tensor.__getitem__` row indexing inside mmdet's
target builders (e.g. TOV_mmdetection/mmdet/core/bbox/assigners/
max_iou_assigner.py assigned_labels, anchor_head._get_targets_single) —
semantics identical, formulation TPU-first.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["take_rows"]

# above this table size the quadratic one-hot stops paying for itself and
# the plain gather is used instead (traffic ~ N*G floats vs N rows)
_MAX_ONEHOT_TABLE = 1024


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """`table[..., idx, :]` (or `table[..., idx]` for vector tables) as a
    one-hot MXU contraction.

    table: (*batch, G) or (*batch, G, K) — float/int/bool.
    idx:   (*batch, N) int, values assumed pre-clipped to [0, G).
    Returns (*batch, N) or (*batch, N, K) with table's dtype.

    Batch dims (if any) must match between table and idx; also safe under
    vmap (einsum broadcasts the leading dims).
    """
    vector_table = (table.ndim == idx.ndim)
    g = table.shape[-1] if vector_table else table.shape[-2]
    if g > _MAX_ONEHOT_TABLE:
        if vector_table:
            return jnp.take_along_axis(table, idx, axis=-1)
        return jnp.take_along_axis(table, idx[..., None], axis=-2)

    oh = (idx[..., None] == jnp.arange(g, dtype=idx.dtype)) \
        .astype(jnp.float32)                                  # (*b, N, G)
    ftable = table.astype(jnp.float32)
    if vector_table:
        out = jnp.einsum("...ng,...g->...n", oh, ftable,
                         precision=jax.lax.Precision.HIGHEST)
    else:
        out = jnp.einsum("...ng,...gk->...nk", oh, ftable,
                         precision=jax.lax.Precision.HIGHEST)
    if table.dtype == jnp.float32:
        return out
    if table.dtype == jnp.bool_:
        return out > 0.5
    if jnp.issubdtype(table.dtype, jnp.integer):
        # sums of exact f32 integers — rint guards ulp noise
        return jnp.rint(out).astype(table.dtype)
    return out.astype(table.dtype)
