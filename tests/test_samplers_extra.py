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


# ---------------------------------------------------------------------------
# Round 4 (VERDICT r3 #7): nms_match-grouped Score-HLR — golden vs a direct
# numpy replica of the reference math (score_hlr_sampler.py:151-213 with
# mmcv nms_match semantics: greedy NMS groups, iou > thr).
# ---------------------------------------------------------------------------

def _ref_nms_match(dets, iou_thr):
    """mmcv nms_match in numpy: groups of (keeper + suppressed), score
    order."""
    scores = dets[:, 4]
    order = np.argsort(-scores, kind="stable")
    alive = np.ones(len(dets), bool)
    groups = []
    x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    for i in order:
        if not alive[i]:
            continue
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-12)
        members = [j for j in order if alive[j]
                   and (j == i or iou[j] > iou_thr)]
        for j in members:
            alive[j] = False
        groups.append(members)      # score-desc within group by order
    return groups


def _ref_score_hlr(scores, boxes, neg_cand, num_expected, iou_thr,
                   score_thr, bias, k):
    """Reference :151-203 (pre loss-ratio): returns (selected valid idx,
    weights over the hlr part)."""
    neg_idx = np.where(neg_cand)[0]
    max_score = scores[neg_idx]
    valid = max_score > score_thr
    valid_idx = neg_idx[valid]
    num_valid = len(valid_idx)
    dets = np.concatenate(
        [boxes[valid_idx], max_score[valid][:, None]], -1)
    groups = _ref_nms_match(dets, iou_thr)
    imp = np.zeros(num_valid)
    for g in groups:
        g_score = dets[g, 4]
        rank = np.arange(len(g))
        imp[g] = num_valid - rank + g_score
    imp_rank_inds = np.argsort(-imp, kind="stable")
    imp_rank = np.empty(num_valid, np.int64)
    imp_rank[imp_rank_inds] = np.arange(num_valid)
    hlr = imp_rank_inds[:num_expected]
    up_bound = max(num_expected, num_valid)
    w = (up_bound - imp_rank[hlr].astype(np.float64)) / up_bound
    w = (bias + (1 - bias) * w) ** k
    return valid_idx[hlr], w


def test_score_hlr_nms_match_golden():
    import jax
    import jax.numpy as jnp
    from pointtinybenchmark_tpu.core.samplers import score_hlr_negatives

    rng = np.random.RandomState(3)
    n = 80
    xy = rng.rand(n, 2) * 100
    wh = rng.rand(n, 2) * 30 + 4
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    neg_cand = rng.rand(n) < 0.9
    num_expected, iou_thr, score_thr, bias, k = 20, 0.5, 0.25, 0.1, 0.7

    sel_ref, w_ref = _ref_score_hlr(scores, boxes, neg_cand, num_expected,
                                    iou_thr, score_thr, bias, k)
    assert len(sel_ref) > 3, "degenerate fixture"

    neg_mask, w = score_hlr_negatives(
        jax.random.PRNGKey(0), jnp.asarray(neg_cand), jnp.asarray(scores),
        jnp.asarray(boxes), num_expected, iou_thr, score_thr, bias, k)
    neg_mask = np.asarray(neg_mask)
    w = np.asarray(w)

    valid = neg_cand & (scores > score_thr)
    # hlr-selected set and weights match the reference exactly
    got_valid_sel = np.where(neg_mask & valid)[0]
    np.testing.assert_array_equal(np.sort(got_valid_sel), np.sort(sel_ref))
    ref_w = dict(zip(sel_ref, w_ref))
    for i in got_valid_sel:
        np.testing.assert_allclose(w[i], ref_w[i], rtol=1e-5, atol=1e-6,
                                   err_msg=f"weight of box {i}")
    # random fill only from the below-threshold pool, budget respected
    fill = np.where(neg_mask & ~valid)[0]
    assert neg_mask.sum() == min(num_expected, neg_cand.sum())
    assert all(~valid[i] for i in fill)


def test_score_hlr_loss_ratio_normalization():
    import jax
    import jax.numpy as jnp
    from pointtinybenchmark_tpu.core.samplers import score_hlr_negatives

    rng = np.random.RandomState(5)
    n = 40
    xy = rng.rand(n, 2) * 60
    wh = rng.rand(n, 2) * 20 + 4
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    neg_cand = np.ones(n, bool)
    losses = rng.rand(n).astype(np.float32)
    neg_mask, w = score_hlr_negatives(
        jax.random.PRNGKey(1), jnp.asarray(neg_cand), jnp.asarray(scores),
        jnp.asarray(boxes), 16, losses=jnp.asarray(losses))
    neg_mask, w = np.asarray(neg_mask), np.asarray(w)
    # reference :205-208 — weighted selected loss sums to the unweighted sum
    np.testing.assert_allclose((losses * w).sum(),
                               losses[neg_mask].sum(), rtol=1e-5)
