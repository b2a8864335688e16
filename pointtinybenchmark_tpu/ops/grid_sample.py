"""Bilinear point sampling with torch `F.grid_sample` semantics.

Parity target: the CPR point-feature extraction hot path
(TOV_mmdetection/mmdet/models/point/dense_heads/cpr_head.py:73-93), which
calls `F.grid_sample(feat, grid, align_corners=False, padding_mode=...)`.
Off-by-half-pixel errors here silently change refined points, so the
align_corners=False unnormalization `x_pix = (x+1)*W/2 - 0.5` is implemented
exactly (SURVEY.md §7.3 item 3).

Layout is NHWC (TPU-native). All sampling is expressed as XLA gathers —
no Python loops, fully jit/vmap-safe.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["grid_sample", "point_sample", "point_sample_pixel"]


def _gather_2d(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """img: (H, W, C); iy/ix: integer index arrays of shape S -> (*S, C)."""
    h, w = img.shape[:2]
    flat = img.reshape(h * w, -1)
    idx = iy * w + ix
    return flat[idx.reshape(-1)].reshape(*idx.shape, img.shape[-1])


def _bilinear_one(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                  padding_mode: str) -> jnp.ndarray:
    """Bilinear sample one image. img: (H, W, C); x/y: pixel coords, shape S.

    Returns (*S, C).
    """
    h, w = img.shape[:2]
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, w - 1.0)
        y = jnp.clip(y, 0.0, h - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner(yc, xc, wgt):
        inb = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        iyc = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        ixc = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        v = _gather_2d(img, iyc, ixc)
        if padding_mode == "zeros":
            wgt = jnp.where(inb, wgt, 0.0)
        return v * wgt[..., None]

    out = (corner(y0, x0, wy0 * wx0) + corner(y0, x1, wy0 * wx1)
           + corner(y1, x0, wy1 * wx0) + corner(y1, x1, wy1 * wx1))
    return out


@partial(jax.jit, static_argnames=("align_corners", "padding_mode"))
def grid_sample(feat: jnp.ndarray, grid: jnp.ndarray,
                align_corners: bool = False,
                padding_mode: str = "zeros") -> jnp.ndarray:
    """torch.nn.functional.grid_sample (bilinear) parity, NHWC layout.

    Args:
        feat: (N, H, W, C)
        grid: (N, Hg, Wg, 2) normalized coords in [-1, 1]; last dim (x, y).
    Returns:
        (N, Hg, Wg, C)
    """
    assert padding_mode in ("zeros", "border"), padding_mode
    h, w = feat.shape[1:3]
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (w - 1)
        y = (gy + 1.0) * 0.5 * (h - 1)
    else:
        x = (gx + 1.0) * 0.5 * w - 0.5
        y = (gy + 1.0) * 0.5 * h - 0.5
    return jax.vmap(lambda im, xx, yy: _bilinear_one(im, xx, yy, padding_mode))(feat, x, y)


@partial(jax.jit, static_argnames=("align_corners", "padding_mode"))
def point_sample(feat: jnp.ndarray, points: jnp.ndarray,
                 align_corners: bool = False,
                 padding_mode: str = "border") -> jnp.ndarray:
    """Sample features at normalized points.

    Args:
        feat: (N, H, W, C)
        points: (N, P, 2) normalized coords in [-1, 1], (x, y).
    Returns:
        (N, P, C)
    """
    out = grid_sample(feat, points[:, :, None, :], align_corners, padding_mode)
    return out[:, :, 0, :]


@partial(jax.jit, static_argnames=("padding_mode",))
def point_sample_pixel(feat: jnp.ndarray, points: jnp.ndarray,
                       padding_mode: str = "border") -> jnp.ndarray:
    """Sample features at *pixel-space* points on the feature grid.

    A point (x, y) in feature-map pixel units samples bilinearly between the
    four surrounding cell centers (cell centers live at integer coords).

    Args:
        feat: (N, H, W, C)
        points: (N, P, 2) pixel coords on the feature grid, (x, y).
    Returns:
        (N, P, C)
    """
    x, y = points[..., 0], points[..., 1]
    return jax.vmap(lambda im, xx, yy: _bilinear_one(im, xx, yy, padding_mode))(feat, x, y)
