"""CenterRegionAssigner — scale-adaptive center-region assignment."""
import numpy as np

import jax.numpy as jnp

from pointtinybenchmark_tpu.core.assigners import CenterRegionAssigner


def test_center_region_pos_neg_ignore():
    a = CenterRegionAssigner(pos_scale=0.3, neg_scale=0.6)
    boxes = jnp.asarray([[14, 14, 18, 18],    # center (16,16) = gt center
                         [2, 2, 6, 6],        # far away -> neg
                         [10, 10, 13, 13]],   # in neg region only -> ignore
                        jnp.float32)
    gt = jnp.asarray([[8, 8, 24, 24]], jnp.float32)
    assigned, _, labels = a.assign(boxes, gt, jnp.asarray([True]),
                                   jnp.asarray([3]))
    assert list(np.asarray(assigned)) == [1, 0, -1]
    assert list(np.asarray(labels)) == [3, -1, -1]


def test_center_region_smallest_gt_wins():
    a = CenterRegionAssigner(pos_scale=1.0, neg_scale=1.0)
    boxes = jnp.asarray([[15, 15, 17, 17]], jnp.float32)
    gt = jnp.asarray([[0, 0, 32, 32], [12, 12, 20, 20]], jnp.float32)
    assigned, _, _ = a.assign(boxes, gt, jnp.asarray([True, True]),
                              jnp.asarray([0, 1]))
    assert int(assigned[0]) == 2  # the smaller gt

    # invalid gt is never assigned
    assigned2, _, _ = a.assign(boxes, gt, jnp.asarray([True, False]),
                               jnp.asarray([0, 1]))
    assert int(assigned2[0]) == 1
