"""InstanceBalancedPosSampler and CombinedSampler."""
import numpy as np

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.core.samplers import (CombinedSampler,
                                                  InstanceBalancedPosSampler)


def test_instance_balanced_pos_sampler_spreads_instances():
    # 30 candidates: 20 belong to gt 1, 10 to gt 2; budget 8 positives
    assigned = jnp.asarray([1] * 20 + [2] * 10 + [0] * 34, jnp.int32)
    labels = jnp.where(assigned > 0, 0, -1)
    s = InstanceBalancedPosSampler(num=16, pos_fraction=0.5)
    res = s.sample(jax.random.PRNGKey(0), assigned, labels)
    pos = np.asarray(res.pos_mask)
    a = np.asarray(assigned)
    n1 = int(pos[a == 1].sum())
    n2 = int(pos[a == 2].sum())
    assert n1 + n2 == 8
    # balanced: the rarer instance gets close to half the budget
    assert n2 >= 3, (n1, n2)
    assert int(np.asarray(res.neg_mask).sum()) == 8


def test_combined_sampler_masks_disjoint():
    assigned = jnp.asarray([1] * 6 + [0] * 26, jnp.int32)
    labels = jnp.where(assigned > 0, 0, -1)
    s = CombinedSampler(num=16, pos_fraction=0.25,
                        pos_sampler=dict(type="InstanceBalancedPosSampler"),
                        neg_sampler=dict(type="RandomSampler"))
    res = s.sample(jax.random.PRNGKey(1), assigned, labels)
    pos = np.asarray(res.pos_mask)
    neg = np.asarray(res.neg_mask)
    assert not (pos & neg).any()
    assert pos.sum() == 4 and neg.sum() == 12
