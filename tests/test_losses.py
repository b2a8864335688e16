import numpy as np
import pytest

import jax.numpy as jnp

from pointtinybenchmark_tpu.models.losses import (AllPosLoss, CrossEntropyLoss,
                                                  FocalLoss, GIoULoss, IoULoss,
                                                  L1Loss, MILLoss, MSELoss,
                                                  SmoothL1Loss)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_sigmoid_focal(pred, target_onehot, gamma=2.0, alpha=0.25):
    # mmdet py_sigmoid_focal_loss formula
    pred_sigmoid = pred.sigmoid()
    target = target_onehot.type_as(pred)
    pt = (1 - pred_sigmoid) * target + pred_sigmoid * (1 - target)
    focal_weight = (alpha * target + (1 - alpha) * (1 - target)) * pt.pow(gamma)
    return F.binary_cross_entropy_with_logits(pred, target, reduction="none") * focal_weight


def test_focal_loss_matches_mmdet_formula():
    rng = np.random.RandomState(0)
    pred = rng.randn(40, 5).astype(np.float32) * 3
    labels = rng.randint(0, 6, 40)  # 5 == background
    want = _torch_sigmoid_focal(
        torch.from_numpy(pred),
        F.one_hot(torch.from_numpy(labels), 6)[:, :5]).sum().numpy()
    loss = FocalLoss(reduction="sum")(jnp.asarray(pred), jnp.asarray(labels))
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_focal_loss_avg_factor_and_weight():
    pred = jnp.zeros((4, 2))
    labels = jnp.asarray([0, 1, 2, 2])
    w = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    loss = FocalLoss()(pred, labels, weight=w, avg_factor=2.0)
    assert float(loss) > 0


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(1)
    pred = rng.randn(30, 7).astype(np.float32)
    labels = rng.randint(0, 7, 30)
    want = F.cross_entropy(torch.from_numpy(pred), torch.from_numpy(labels)).numpy()
    got = CrossEntropyLoss()(jnp.asarray(pred), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_bce_matches_torch():
    rng = np.random.RandomState(2)
    pred = rng.randn(30, 4).astype(np.float32)
    labels = rng.randint(0, 5, 30)  # 4 = bg
    want = F.binary_cross_entropy_with_logits(
        torch.from_numpy(pred),
        F.one_hot(torch.from_numpy(labels), 5)[:, :4].float(),
        reduction="none").sum(-1).mean().numpy()
    got = CrossEntropyLoss(use_sigmoid=True)(jnp.asarray(pred), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_smooth_l1_matches_torch():
    rng = np.random.RandomState(3)
    pred = rng.randn(20, 4).astype(np.float32)
    tgt = rng.randn(20, 4).astype(np.float32)
    want = F.smooth_l1_loss(torch.from_numpy(pred), torch.from_numpy(tgt)).numpy()
    got = SmoothL1Loss()(jnp.asarray(pred), jnp.asarray(tgt))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    want = F.l1_loss(torch.from_numpy(pred), torch.from_numpy(tgt)).numpy()
    got = L1Loss()(jnp.asarray(pred), jnp.asarray(tgt))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    want = F.mse_loss(torch.from_numpy(pred), torch.from_numpy(tgt)).numpy()
    got = MSELoss()(jnp.asarray(pred), jnp.asarray(tgt))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_iou_losses():
    pred = jnp.asarray([[0., 0., 10., 10.]])
    tgt = jnp.asarray([[0., 0., 10., 10.]])
    assert float(IoULoss()(pred, tgt)) < 1e-5
    assert float(GIoULoss()(pred, tgt)) < 1e-5
    pred2 = jnp.asarray([[0., 0., 5., 10.]])
    assert float(GIoULoss()(pred2, tgt)) > 0.4


def _torch_mil_loss(bag_cls_prob, bag_ins_outs, labels, valid, eps=1e-6):
    # reference MILLoss.forward re-derived in torch (gfocal, k=1)
    B, N, C = bag_cls_prob.shape
    prob_cls = bag_cls_prob.unsqueeze(-1)
    prob_ins = bag_ins_outs.reshape(B, N, C, -1)
    prob_ins = prob_ins.softmax(dim=1) * valid.unsqueeze(-1)
    prob_ins = F.normalize(prob_ins, dim=1, p=1)
    prob = (prob_cls * prob_ins).sum(dim=1)
    label_weights = (valid.sum(dim=1) > 0).float()
    onehot = F.one_hot(labels, C).float()
    num_sample = max(float((label_weights.sum(-1) > 0).sum()), 1.0)
    p = prob.squeeze(-1)
    l1 = (p - onehot) ** 2
    l2 = onehot * (p + eps).log() + (1 - onehot) * (1 - p + eps).log()
    loss = -(l1 * l2 * label_weights).sum(-1)
    return loss.sum() / num_sample


def test_mil_loss_matches_reference_formula():
    rng = np.random.RandomState(4)
    b, n, c = 6, 9, 3
    cls_prob = rng.rand(b, n, c).astype(np.float32)
    ins = rng.randn(b, n, c).astype(np.float32)
    labels = rng.randint(0, c, b)
    valid = (rng.rand(b, n, 1) > 0.3).astype(np.float32)
    valid[0] = 1.0  # ensure at least one fully-valid bag
    want = _torch_mil_loss(torch.from_numpy(cls_prob), torch.from_numpy(ins),
                           torch.from_numpy(labels), torch.from_numpy(valid)).numpy()
    loss, acc, ns = MILLoss()(jnp.asarray(cls_prob), jnp.asarray(ins),
                              jnp.asarray(labels), jnp.asarray(valid))
    np.testing.assert_allclose(float(loss), want, rtol=1e-4)
    assert 0 <= float(acc) <= 100


def test_mil_loss_empty_bag_ignored():
    b, n, c = 2, 4, 2
    cls_prob = np.full((b, n, c), 0.5, np.float32)
    ins = np.zeros((b, n, c), np.float32)
    labels = np.asarray([0, 1])
    valid = np.ones((b, n, 1), np.float32)
    valid[1] = 0.0  # bag 1 empty -> only bag 0 counts
    loss, _, ns = MILLoss()(jnp.asarray(cls_prob), jnp.asarray(ins),
                            jnp.asarray(labels), jnp.asarray(valid))
    assert float(ns) == 1.0
    assert np.isfinite(float(loss))


def test_all_pos_loss_runs():
    rng = np.random.RandomState(5)
    b, n, c = 3, 5, 4
    cls_prob = rng.rand(b, n, c).astype(np.float32)
    ins = rng.randn(b, n, c).astype(np.float32)
    labels = rng.randint(0, c, b)
    valid = np.ones((b, n, 1), np.float32)
    loss, acc, ns = AllPosLoss()(jnp.asarray(cls_prob), jnp.asarray(ins),
                                 jnp.asarray(labels), jnp.asarray(valid))
    assert np.isfinite(float(loss)) and float(ns) == b * n


def test_weighted_hausdorff_distance():
    from pointtinybenchmark_tpu.models.losses import (
        weighted_hausdorff_distance)
    grid = jnp.asarray(np.stack(np.meshgrid(np.arange(8.0), np.arange(8.0)),
                                -1).reshape(-1, 2))
    gt = jnp.asarray([[2.0, 2.0], [6.0, 6.0]])
    valid = jnp.asarray([True, True])
    # perfect: probability mass exactly on the gt points
    p_good = jnp.zeros((64,)).at[2 * 8 + 2].set(1.0).at[6 * 8 + 6].set(1.0)
    p_bad = jnp.ones((64,)) / 64
    good = float(weighted_hausdorff_distance(p_good, grid, gt, valid, 12.0))
    bad = float(weighted_hausdorff_distance(p_bad, grid, gt, valid, 12.0))
    assert good < bad
    assert good < 1.0


def test_varifocal_loss_matches_reference_formula():
    from pointtinybenchmark_tpu.models.losses import VarifocalLoss
    rng = np.random.RandomState(3)
    pred = rng.randn(30, 4).astype(np.float32) * 2
    target = np.zeros((30, 4), np.float32)
    target[np.arange(10), rng.randint(0, 4, 10)] = rng.rand(10)
    tp, tt = torch.from_numpy(pred), torch.from_numpy(target)
    ps = tp.sigmoid()
    alpha, gamma = 0.75, 2.0
    fw = tt * (tt > 0).float() + alpha * (ps - tt).abs().pow(gamma) * (tt <= 0).float()
    want = (F.binary_cross_entropy_with_logits(tp, tt, reduction="none")
            * fw).sum().numpy()
    got = VarifocalLoss()(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_ghmc_matches_reference_loop():
    from pointtinybenchmark_tpu.models.losses import GHMC
    rng = np.random.RandomState(4)
    pred = rng.randn(50, 3).astype(np.float32) * 2
    target = (rng.rand(50, 3) > 0.7).astype(np.float32)
    lw = (rng.rand(50, 3) > 0.1).astype(np.float32)
    # reference per-bin loop (mmdet ghm_loss.py GHMC.forward, momentum=0)
    bins = 10
    edges = np.arange(bins + 1) / bins
    edges[-1] += 1e-6
    tp = torch.from_numpy(pred)
    tt = torch.from_numpy(target)
    g = (tp.sigmoid().detach() - tt).abs().numpy()
    valid = lw > 0
    tot = max(valid.sum(), 1.0)
    weights = np.zeros_like(pred)
    n = 0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num = inds.sum()
        if num > 0:
            weights[inds] = tot / num
            n += 1
    if n > 0:
        weights = weights / n
    want = (F.binary_cross_entropy_with_logits(
        tp, tt, reduction="none").numpy() * weights).sum() / tot
    got = GHMC()(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(lw))
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_ghmr_runs_and_harmonizes():
    from pointtinybenchmark_tpu.models.losses import GHMR
    rng = np.random.RandomState(5)
    pred = jnp.asarray(rng.randn(40, 4).astype(np.float32))
    target = jnp.asarray(rng.randn(40, 4).astype(np.float32))
    lw = jnp.ones((40, 4))
    loss = GHMR()(pred, target, lw)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # zero validity -> zero loss
    assert float(GHMR()(pred, target, jnp.zeros((40, 4)))) == 0.0


def test_seesaw_loss_properties():
    import jax
    from pointtinybenchmark_tpu.models.losses import SeesawLoss
    rng = np.random.RandomState(6)
    pred = jnp.asarray(rng.randn(40, 4).astype(np.float32))
    # class 0 dominant, class 3 rare
    target = jnp.asarray([0] * 30 + [1] * 6 + [2] * 3 + [3], jnp.int32)
    loss = SeesawLoss(num_classes=4)(pred, target)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # p=0, q=0 -> seesaw weights vanish -> plain softmax CE
    plain = SeesawLoss(num_classes=4, p=0.0, q=0.0)(pred, target)
    onehot = np.eye(4)[np.asarray(target)]
    logp = np.asarray(jax.nn.log_softmax(pred, -1))
    ce = -(logp * onehot).sum()
    np.testing.assert_allclose(float(plain), ce, rtol=1e-5)
    # mitigation only (q=0) shrinks negative pressure: loss <= plain CE;
    # compensation only (p=0) boosts misclassified negatives: loss >= CE
    mit = SeesawLoss(num_classes=4, p=0.8, q=0.0)(pred, target)
    comp = SeesawLoss(num_classes=4, p=0.0, q=2.0)(pred, target)
    assert float(mit) <= float(plain) + 1e-4
    assert float(comp) >= float(plain) - 1e-4


def test_balanced_l1_matches_reference_formula():
    from pointtinybenchmark_tpu.models.losses import BalancedL1Loss
    rng = np.random.RandomState(7)
    pred = torch.from_numpy(rng.randn(30, 4).astype(np.float32))
    target = torch.from_numpy(rng.randn(30, 4).astype(np.float32))
    alpha, gamma, beta = 0.5, 1.5, 1.0
    # mmdet balanced_l1_loss reference formula
    diff = (pred - target).abs()
    b = np.e ** (gamma / alpha) - 1
    want = torch.where(
        diff < beta,
        alpha / b * (b * diff + 1) * torch.log(b * diff / beta + 1)
        - alpha * diff,
        gamma * diff + gamma / b - alpha * beta).sum().numpy()
    got = BalancedL1Loss(alpha=alpha, gamma=gamma, beta=beta)(
        jnp.asarray(np.asarray(pred)), jnp.asarray(np.asarray(target)))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
