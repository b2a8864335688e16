"""Pallas TPU kernels for the detection hot ops.

`iou_suppression_matrix`: the O(N^2) IoU-vs-threshold matrix that feeds the
fixpoint NMS (ops/nms.py) — blocked (128, 256) tiles computed in VMEM, the
boolean suppression mask emitted directly (no float NxN IoU matrix in HBM).

TPU-only at runtime; callers keep an identical XLA fallback, and CPU tests
exercise the kernel in interpreter mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu imports fine on CPU-only hosts; guard for safety
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = ["iou_suppression_matrix", "pallas_available", "BLK_I", "BLK_J"]

BLK_I = 128   # sublane-aligned
BLK_J = 256   # lane-aligned


def pallas_available() -> bool:
    try:
        return pltpu is not None and jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _suppress_kernel(thr_ref, boxes_i_ref, boxes_j_ref, out_ref):
    """One (BLK_I, BLK_J) tile of sup[i, j] = iou(i, j) > thr."""
    bi = boxes_i_ref[:]                      # (BLK_I, 4)
    bj = boxes_j_ref[:]                      # (BLK_J, 4)
    thr = thr_ref[0]
    x1i, y1i, x2i, y2i = bi[:, 0], bi[:, 1], bi[:, 2], bi[:, 3]
    x1j, y1j, x2j, y2j = bj[:, 0], bj[:, 1], bj[:, 2], bj[:, 3]
    ai = (x2i - x1i) * (y2i - y1i)
    aj = (x2j - x1j) * (y2j - y1j)
    ix1 = jnp.maximum(x1i[:, None], x1j[None, :])
    iy1 = jnp.maximum(y1i[:, None], y1j[None, :])
    ix2 = jnp.minimum(x2i[:, None], x2j[None, :])
    iy2 = jnp.minimum(y2i[:, None], y2j[None, :])
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    union = jnp.maximum(ai[:, None] + aj[None, :] - inter, 1e-6)
    out_ref[:] = (inter > thr * union)


@functools.partial(jax.jit, static_argnames=("interpret",))
def iou_suppression_matrix(boxes: jnp.ndarray, iou_threshold,
                           interpret: bool = False) -> jnp.ndarray:
    """(N, N) bool: iou(i, j) > threshold. N must be a multiple of the block
    sizes (callers pad; padded rows are masked by the caller)."""
    n = boxes.shape[0]
    assert n % BLK_I == 0 and n % BLK_J == 0, n
    thr = jnp.full((1,), iou_threshold, jnp.float32)
    grid = (n // BLK_I, n // BLK_J)
    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=(pltpu.SMEM if (pltpu and not interpret)
                                       else None)),
            pl.BlockSpec((BLK_I, 4), lambda i, j: (i, 0)),
            pl.BlockSpec((BLK_J, 4), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((BLK_I, BLK_J), lambda i, j: (i, j)),
    )
    return pl.pallas_call(
        _suppress_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.bool_),
        grid_spec=grid_spec,
        interpret=interpret,
    )(thr, boxes.astype(jnp.float32), boxes.astype(jnp.float32))
