"""Weighted Hausdorff Distance loss.

Parity target: fork models/losses/weighted_hausdorff_distance.py:59 (the
loss behind the legacy BasicLocatorHead — kept for capability parity; the
reference's consumer is dead code, SURVEY.md §0).

WHD between a probability map p over grid points X and gt points Y:
  term1 = (1/(S+eps)) * sum_x p(x) * min_y d(x, y)
  term2 = mean_y  M_alpha[ p(x) * d(x,y) + (1-p(x)) * d_max ]
with S = sum p, and M_alpha the generalized (power) mean over x.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...utils.registry import LOSSES

__all__ = ["WeightedHausdorffDistanceLoss", "weighted_hausdorff_distance"]


def weighted_hausdorff_distance(prob_map: jnp.ndarray,
                                grid_points: jnp.ndarray,
                                gt_points: jnp.ndarray,
                                gt_valid: jnp.ndarray,
                                max_dist: float,
                                alpha: float = -1.0,
                                eps: float = 1e-6) -> jnp.ndarray:
    """prob_map (N,), grid_points (N, 2), gt_points (G, 2), gt_valid (G,)."""
    d = jnp.linalg.norm(grid_points[:, None, :] - gt_points[None, :, :],
                        axis=-1)                                  # (N, G)
    d = jnp.where(gt_valid[None, :], d, max_dist)
    s = prob_map.sum()
    num_gt = jnp.maximum(gt_valid.sum(), 1)
    term1 = (prob_map * jnp.min(d, axis=1)).sum() / (s + eps)
    weighted = prob_map[:, None] * d + (1 - prob_map[:, None]) * max_dist
    # generalized mean over grid points (alpha < 0 approximates min)
    m_alpha = (jnp.mean(jnp.clip(weighted, eps, None) ** alpha,
                        axis=0)) ** (1.0 / alpha)                  # (G,)
    term2 = jnp.where(gt_valid, m_alpha, 0.0).sum() / num_gt
    return term1 + term2


@LOSSES.register_module()
class WeightedHausdorffDistanceLoss:
    def __init__(self, alpha: float = -1.0, loss_weight: float = 1.0,
                 eps: float = 1e-6):
        self.alpha = alpha
        self.loss_weight = loss_weight
        self.eps = eps

    def __call__(self, prob_map, grid_points, gt_points, gt_valid,
                 max_dist: float,
                 weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        loss = weighted_hausdorff_distance(prob_map, grid_points, gt_points,
                                           gt_valid, max_dist, self.alpha,
                                           self.eps)
        return self.loss_weight * loss
