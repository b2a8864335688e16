import numpy as np

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.core import (AnchorGenerator, HungarianAssignerV2,
                                         MaxIoUAssigner, PointGenerator,
                                         PseudoSampler, RandomSampler,
                                         bbox2delta, bbox_mapping_back_tile,
                                         bbox_mapping_tile, delta2bbox,
                                         distance2bbox, topk_hungarian_match,
                                         xyxy2cxcywh)


# ------------------------------------------------------------- anchors
def test_anchor_generator_golden():
    # mmdet AnchorGenerator(strides=[16], ratios=[1.], scales=[9]) at
    # featmap (2,2): base anchor centered at 0 with size 144.
    gen = AnchorGenerator(strides=[16], ratios=[1.0], scales=[9])
    anchors = np.asarray(gen.grid_anchors([(2, 2)])[0])
    assert anchors.shape == (4, 4)
    np.testing.assert_allclose(anchors[0], [-72, -72, 72, 72])
    np.testing.assert_allclose(anchors[1], [16 - 72, -72, 16 + 72, 72])
    np.testing.assert_allclose(anchors[2], [-72, 16 - 72, 72, 16 + 72])


def test_anchor_generator_octave_scales():
    # RetinaNet "Adap" recipe: octave_base_scale=2, scales_per_octave=3
    gen = AnchorGenerator(strides=[4], ratios=[0.5, 1.0, 2.0],
                          octave_base_scale=2, scales_per_octave=3)
    np.testing.assert_allclose(gen.scales, 2 * 2 ** (np.arange(3) / 3), rtol=1e-6)
    assert gen.num_base_anchors == [9]
    a = np.asarray(gen.base_anchors[0])
    # ratio=1, scale=2, base=4 -> w=h=8 centered at 0
    idx = 3  # ratios-major ordering: ratio index 1, scale index 0
    np.testing.assert_allclose(a[idx], [-4, -4, 4, 4], atol=1e-5)


def test_point_generator():
    gen = PointGenerator()
    pts = np.asarray(gen.grid_points((2, 3), 8))
    assert pts.shape == (6, 3)
    np.testing.assert_allclose(pts[0], [0, 0, 8])
    np.testing.assert_allclose(pts[1], [8, 0, 8])
    np.testing.assert_allclose(pts[3], [0, 8, 8])


# ------------------------------------------------------------- coders
def test_delta_coder_roundtrip():
    rng = np.random.RandomState(0)
    props = rng.rand(20, 4).astype(np.float32) * 50
    props[:, 2:] += props[:, :2] + 5
    gts = props + rng.randn(20, 4).astype(np.float32) * 2
    gts[:, 2:] = np.maximum(gts[:, 2:], gts[:, :2] + 1)
    means = (0., 0., 0., 0.)
    stds = (0.1, 0.1, 0.2, 0.2)
    d = bbox2delta(jnp.asarray(props), jnp.asarray(gts), means, stds)
    back = delta2bbox(jnp.asarray(props), d, means, stds)
    np.testing.assert_allclose(np.asarray(back), gts, rtol=1e-4, atol=1e-3)


def test_distance2bbox():
    pts = jnp.asarray([[10., 10.]])
    dist = jnp.asarray([[2., 3., 4., 5.]])
    out = np.asarray(distance2bbox(pts, dist))
    np.testing.assert_allclose(out, [[8, 7, 14, 15]])


def test_tile_mapping_roundtrip():
    boxes = jnp.asarray([[100., 100., 120., 130.], [1., 1., 2.5, 40.]])
    off = jnp.asarray([50., 60.])
    mapped, valid = bbox_mapping_tile(boxes, off, (512, 640))
    np.testing.assert_allclose(np.asarray(mapped[0]), [50, 40, 70, 70])
    assert bool(valid[0]) and not bool(valid[1])  # second box <2px wide
    back = bbox_mapping_back_tile(mapped, off)
    np.testing.assert_allclose(np.asarray(back[0]), np.asarray(boxes[0]))


# ------------------------------------------------------------- assigners
def test_max_iou_assigner_basic():
    assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.3)
    anchors = jnp.asarray([
        [0, 0, 10, 10],     # iou 1.0 with gt0
        [0, 0, 10, 9],      # high iou with gt0
        [100, 100, 110, 110],  # no overlap -> neg
        [20, 20, 30, 30],   # iou 1.0 with gt1
    ], jnp.float32)
    gts = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30], [0, 0, 0, 0]], jnp.float32)
    gt_valid = jnp.asarray([True, True, False])
    gt_labels = jnp.asarray([2, 5, 0])
    assigned, max_ov, labels = assigner.assign(anchors, gts, gt_valid, gt_labels)
    assert assigned.tolist() == [1, 1, 0, 2]
    assert labels.tolist() == [2, 2, -1, 5]


def test_max_iou_assigner_no_gt_all_background():
    # mmdet: with zero gts every anchor is background (0), not ignore (-1)
    assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4)
    anchors = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15]], jnp.float32)
    gts = jnp.zeros((3, 4), jnp.float32)
    assigned, _, labels = assigner.assign(anchors, gts, jnp.zeros(3, bool),
                                          jnp.zeros(3, jnp.int32))
    assert assigned.tolist() == [0, 0]
    assert labels.tolist() == [-1, -1]


def test_max_iou_assigner_low_quality():
    # gt1 best anchor has iou 0.35 (< pos_thr) but >= min_pos_iou -> assigned
    assigner = MaxIoUAssigner(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3)
    anchors = jnp.asarray([[0, 0, 10, 10], [18, 20, 30, 30]], jnp.float32)
    gts = jnp.asarray([[0, 0, 10, 10], [20, 20, 28, 30]], jnp.float32)
    gt_valid = jnp.asarray([True, True])
    assigned, _, _ = assigner.assign(anchors, gts, gt_valid,
                                     jnp.asarray([0, 0]))
    assert assigned.tolist()[1] == 2


def test_max_iou_assigner_ignore_regions():
    assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                              ignore_iof_thr=0.5)
    anchors = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110]], jnp.float32)
    gts = jnp.asarray([[200, 200, 210, 210]], jnp.float32)
    ign = jnp.asarray([[0, 0, 12, 12]], jnp.float32)
    assigned, _, _ = assigner.assign(
        anchors, gts, jnp.asarray([True]), jnp.asarray([0]),
        gt_bboxes_ignore=ign, gt_ignore_valid=jnp.asarray([True]))
    assert assigned.tolist() == [-1, 0]


def test_topk_hungarian_match():
    # 6 preds, 2 gts, k=2: each gt gets exactly 2 preds, 2 stay bg
    from pointtinybenchmark_tpu.core import topk_hungarian_match_callback
    cost = np.full((1, 6, 2), 10.0, np.float32)
    cost[0, 0, 0] = 0.1; cost[0, 1, 0] = 0.2  # best two for gt0
    cost[0, 2, 1] = 0.1; cost[0, 3, 1] = 0.2  # best two for gt1
    args = (jnp.asarray(cost), jnp.asarray([2], jnp.int32),
            jnp.asarray([6], jnp.int32), 2)
    out = np.asarray(topk_hungarian_match(*args))
    assert out[0].tolist() == [1, 1, 2, 2, 0, 0]
    out_cb = np.asarray(topk_hungarian_match_callback(*args))  # scipy golden
    assert out_cb[0].tolist() == [1, 1, 2, 2, 0, 0]


def test_auction_matches_scipy_optimum():
    from scipy.optimize import linear_sum_assignment
    from pointtinybenchmark_tpu.core import topk_auction_match
    rng = np.random.RandomState(7)
    n, g = 50, 8
    cost = rng.rand(1, n, g).astype(np.float32) * 10
    gt_valid = jnp.ones((1, g), bool)
    out = np.asarray(topk_auction_match(jnp.asarray(cost), gt_valid, topk_k=1))[0]
    # every gt matched exactly once
    matched = out[out > 0]
    assert len(matched) == g and len(set(matched)) == g
    # total cost equals scipy's optimum (within auction eps slack)
    got_cost = sum(cost[0, i, out[i] - 1] for i in range(n) if out[i] > 0)
    rows, cols = linear_sum_assignment(cost[0].T)  # gts x preds
    want_cost = cost[0].T[rows, cols].sum()
    assert got_cost <= want_cost + g * 1e-3, (got_cost, want_cost)


def test_auction_topk_rounds():
    from pointtinybenchmark_tpu.core import topk_auction_match
    cost = np.full((1, 6, 2), 10.0, np.float32)
    cost[0, 0, 0] = 0.1; cost[0, 1, 0] = 0.2
    cost[0, 2, 1] = 0.1; cost[0, 3, 1] = 0.2
    out = np.asarray(topk_auction_match(
        jnp.asarray(cost), jnp.ones((1, 2), bool), topk_k=2))[0]
    assert out.tolist() == [1, 1, 2, 2, 0, 0]


def test_topk_hungarian_no_gt():
    cost = np.zeros((1, 4, 2), np.float32)
    out = np.asarray(topk_hungarian_match(
        jnp.asarray(cost), jnp.asarray([0], jnp.int32), jnp.asarray([4], jnp.int32), 1))
    assert out.sum() == 0


def test_hungarian_assigner_v2_end_to_end():
    assigner = HungarianAssignerV2(
        cls_costs=[dict(type="FocalLossCost", weight=1.0)],
        reg_costs=[dict(type="DisCostV2", weight=0.1, norm_with_img_wh=True, p=2)],
        topk_k=2)
    b, n, g, c = 2, 16, 3, 4
    rng = np.random.RandomState(3)
    preds = jnp.asarray(rng.rand(b, n, 2).astype(np.float32) * 100)
    logits = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    gt_pts = jnp.asarray(rng.rand(b, g, 2).astype(np.float32) * 100)
    gt_labels = jnp.asarray(rng.randint(0, c, (b, g)), jnp.int32)
    gt_valid = jnp.asarray([[True, True, False], [True, False, False]])
    metas = {"img_shape": jnp.asarray([[100, 100], [100, 100]], jnp.int32)}
    assigned, labels = assigner.assign_batch(preds, logits, gt_pts, gt_labels,
                                             metas, gt_valid)
    a = np.asarray(assigned)
    # image 0: 2 valid gts * k=2 -> 4 positives; image 1: 1 gt * 2 -> 2
    assert (a[0] > 0).sum() == 4 and (a[1] > 0).sum() == 2
    assert set(a[0][a[0] > 0]) == {1, 2}
    assert set(a[1][a[1] > 0]) == {1}
    lab = np.asarray(labels)
    assert (lab[a == 0] == -1).all()


# ------------------------------------------------------------- samplers
def test_random_sampler_budgets():
    key = jax.random.PRNGKey(0)
    n = 1000
    assigned = jnp.asarray(np.concatenate([np.ones(30), np.zeros(970)]), jnp.int32)
    labels = jnp.full((n,), -1, jnp.int32)
    s = RandomSampler(num=256, pos_fraction=0.5)
    res = s.sample(key, assigned, labels)
    num_pos = int(res.pos_mask.sum())
    num_neg = int(res.neg_mask.sum())
    assert num_pos == 30  # fewer positives than budget -> take all
    assert num_neg == 128  # fixed neg budget = num - pos_budget
    assert not bool((res.pos_mask & res.neg_mask).any())


def test_pseudo_sampler():
    assigned = jnp.asarray([0, 1, -1, 2], jnp.int32)
    res = PseudoSampler().sample(None, assigned, jnp.asarray([-1, 0, -1, 1]))
    assert res.pos_mask.tolist() == [False, True, False, True]
    assert res.neg_mask.tolist() == [True, False, False, False]


def test_ohem_sampler_picks_hardest():
    from pointtinybenchmark_tpu.core.samplers import OHEMSampler
    import jax
    n = 20
    assigned = jnp.asarray([1] * 4 + [0] * 16, jnp.int32)
    labels = jnp.where(assigned > 0, 0, -1)
    loss = jnp.arange(n, 0, -1).astype(jnp.float32)  # first = hardest
    s = OHEMSampler(num=8, pos_fraction=0.25)
    res = s.sample(jax.random.PRNGKey(0), assigned, labels, loss=loss)
    pos = np.where(np.asarray(res.pos_mask))[0]
    neg = np.where(np.asarray(res.neg_mask))[0]
    np.testing.assert_array_equal(pos, [0, 1])       # 2 hardest positives
    np.testing.assert_array_equal(neg, [4, 5, 6, 7, 8, 9])  # 6 hardest negs
    # no loss -> random fallback still respects budgets
    res = s.sample(jax.random.PRNGKey(0), assigned, labels)
    assert int(np.asarray(res.pos_mask).sum()) <= 2
    assert int(np.asarray(res.neg_mask).sum()) <= 6


def test_tblr_coder_roundtrip():
    from pointtinybenchmark_tpu.core.bbox import bbox2tblr, tblr2bbox
    rng = np.random.RandomState(0)
    priors = rng.rand(12, 4).astype(np.float32) * 50
    priors[:, 2:] = priors[:, :2] + 10 + rng.rand(12, 2).astype(np.float32) * 40
    gts = priors + rng.randn(12, 4).astype(np.float32) * 3
    enc = bbox2tblr(jnp.asarray(priors), jnp.asarray(gts))
    dec = tblr2bbox(jnp.asarray(priors), enc)
    np.testing.assert_allclose(np.asarray(dec), gts, atol=1e-4)


def test_iou_balanced_neg_sampler():
    import jax
    from pointtinybenchmark_tpu.core.samplers import IoUBalancedNegSampler
    n = 300
    rng = np.random.RandomState(0)
    assigned = jnp.asarray([1] * 10 + [0] * (n - 10), jnp.int32)
    labels = jnp.where(assigned > 0, 0, -1)
    # negatives: 10 hard (iou ~0.45), rest easy (iou ~0.05)
    ov = np.full((n,), 0.05, np.float32)
    ov[10:20] = 0.45
    res = IoUBalancedNegSampler(num=64, pos_fraction=0.25, num_bins=3).\
        sample(jax.random.PRNGKey(0), assigned, labels,
               max_overlaps=jnp.asarray(ov))
    neg = np.where(np.asarray(res.neg_mask))[0]
    assert len(neg) <= 48
    # hard negatives oversampled: all 10 hard ones land in their own bin
    hard_picked = ((neg >= 10) & (neg < 20)).sum()
    assert hard_picked >= 8
    # plain-random baseline would pick ~ 48 * 10/290 ≈ 1.7 of them


def test_score_hlr_sampler_prefers_hard_negatives():
    import jax
    from pointtinybenchmark_tpu.core.samplers import ScoreHLRSampler
    n = 400
    assigned = jnp.asarray([1] * 8 + [0] * (n - 8), jnp.int32)
    labels = jnp.where(assigned > 0, 0, -1)
    # 20 hard negatives (high fg score), rest easy
    sc = np.full((n,), 0.01, np.float32)
    sc[8:28] = 0.9
    s = ScoreHLRSampler(num=64, pos_fraction=0.25, k=0.5, bias=0.0)
    picked_hard = 0
    for seed in range(5):
        res = s.sample(jax.random.PRNGKey(seed), assigned, labels,
                       neg_scores=jnp.asarray(sc))
        neg = np.where(np.asarray(res.neg_mask))[0]
        assert len(neg) <= 48
        picked_hard += ((neg >= 8) & (neg < 28)).sum()
    # uniform sampling would pick ~ 20/392 * 48 * 5 = 12.2 hard negatives;
    # rank-linear weighting (k=0.5) prefers them ~1.45x -> expect > 16
    assert picked_hard > 16
    # without scores -> uniform fallback still respects budget
    res = s.sample(jax.random.PRNGKey(0), assigned, labels)
    assert int(np.asarray(res.neg_mask).sum()) <= 48


def test_safe_eval_whitelist():
    """Config-string parser (replaces eval of config-supplied strings;
    VERDICT r1 item 9): legit reference forms work, code execution raises."""
    import numpy as np
    import pytest
    from pointtinybenchmark_tpu.utils.safe_eval import (safe_eval_expr,
                                                        safe_eval_lambda)

    f = safe_eval_lambda("lambda iou: iou")
    assert f(0.35) == 0.35
    f = safe_eval_lambda("lambda iou: (2 * iou) / (1 + iou)")
    assert abs(f(0.5) - 2 / 3) < 1e-12
    f = safe_eval_lambda("lambda iou: max(iou, 0.25)")
    assert f(0.1) == 0.25

    r = safe_eval_expr("np.linspace(.0, 1.00, 101)")
    assert r.shape == (101,) and r[0] == 0.0 and r[-1] == 1.0
    assert safe_eval_expr("1 + 2 * 3") == 7

    for bad in [
            "__import__('os').system('true')",
            "lambda iou: __import__('os')",
            "lambda iou: iou.__class__",
            "open('/etc/passwd')",
            "np.load('x')",
            "lambda iou: (lambda: 1)()",
            "[x for x in (1,)]",
            "getattr(np, 'load')",
    ]:
        with pytest.raises((ValueError, SyntaxError)):
            v = safe_eval_expr(bad) if "lambda" not in bad \
                else safe_eval_lambda(bad)
            if callable(v):
                v(0.5)
