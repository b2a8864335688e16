"""FULL-HEAD golden parity for the flagship POINT stack (VERDICT r3 #5).

Execs the reference P2PHead (point/dense_heads/p2p_head.py:19-572) and
CPRHead (point/dense_heads/cpr_head.py:899-1310, with PointExtractor :602 and
PointRefiner :665-895) whole via tests/reference_loader.py, shares weights
through torch2jax, and pins our batched JAX implementations numerically:

- P2P: decode (`get_pred_points` :125-170), loss (assign + cls/pts losses
  :172-248, at topk_k=1 so scipy LSA and our auction agree up to ties — a
  cost-equality assertion covers the matched pairs), and `get_bboxes`
  (:330-423 per-level topk -> clamp -> pseudo-box NMS -> (cx,cy,score)).
- CPR: loss0 composition (:1131-1229 — MIL bag loss + negative loss +
  optional gt loss, incl. bag construction through CirclePtFeatGenerator
  :442-497 and OutCirclePtFeatGenerator :247-293) and PointRefiner
  refine_single (:780-866 — nearest/classify/merge_th/gt_alpha filters,
  confidence-weighted merge, refine_th fallback).
"""
import os.path as osp
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools",
                            "model_converters"))
import reference_loader as rl  # noqa: E402
from torch2jax import convert_detector_state_dict  # noqa: E402

PAD = (64, 64)


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.normal_(0.0, 0.05, generator=g)
    return module


def _feat(rng, b, h, w, c):
    f = rng.randn(b, h, w, c).astype(np.float32) * 0.5
    t = torch.from_numpy(f.transpose(0, 3, 1, 2)).contiguous()
    return t, jnp.asarray(f)


# ===================================================================
# P2P — flagship TinyPersonV2 shape (strides=[4], 1 class, sigmoid FL)
# ===================================================================

P2P_TRAIN = dict(
    neg_weight=1.0,
    assigner=dict(type="HungarianAssignerV2",
                  cls_costs=dict(type="FocalLossCost", weight=2.0),
                  reg_costs=dict(type="DisCostV2", weight=0.1,
                                 norm_with_img_wh=False),
                  topk_k=1),
    sampler=dict(type="PseudoSampler"))
P2P_TEST = dict(nms_pre=80, score_thr=0.05, pseudo_wh=(16, 16),
                nms=dict(type="nms", iou_threshold=0.2), max_per_img=50)


def _make_p2p_pair(num_classes=1, c=16, stacked=2, train_cfg=None,
                   point_anchor=((0.0, 0.0),)):
    import pointtinybenchmark_tpu.models  # noqa: F401
    from pointtinybenchmark_tpu.models.dense_heads.p2p_head import P2PHead

    loss_cls = dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                    alpha=0.25, loss_weight=1.0)
    loss_reg = dict(type="SmoothL1Loss", beta=1.0 / 9.0, loss_weight=0.5)
    norm = dict(type="GN", num_groups=4, requires_grad=True)
    ref = rl.ref_p2p_head().P2PHead(
        num_classes=num_classes, in_channels=c, feat_channels=c,
        stacked_convs=stacked, strides=[4],
        point_anchor=[list(p) for p in point_anchor],
        pts_gamma=1, reg_norm=1, norm_cfg=rl.make_cfg(norm),
        loss_cls=dict(loss_cls), loss_reg=dict(loss_reg),
        train_cfg=rl.make_cfg(train_cfg) if train_cfg else None,
        test_cfg=rl.make_cfg(P2P_TEST))
    _randomize(ref, seed=21)
    ref.eval()

    ours = P2PHead(num_classes=num_classes, in_channels=c, feat_channels=c,
                   stacked_convs=stacked, strides=(4,),
                   point_anchor=tuple(point_anchor), pts_gamma=1.0,
                   reg_norm=1.0, norm_cfg=dict(norm),
                   loss_cls=dict(loss_cls), loss_reg=dict(loss_reg),
                   train_cfg=train_cfg, test_cfg=dict(P2P_TEST))
    sd = {"bbox_head." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params, _, unmapped = convert_detector_state_dict(sd, depth=50)
    assert not unmapped, unmapped
    return ref, ours, params["bbox_head_m"]


def _p2p_img_metas(b):
    return [dict(img_shape=PAD + (3,), pad_shape=PAD + (3,),
                 scale_factor=np.ones(4, np.float32)) for _ in range(b)]


def test_p2p_forward_and_decode_golden():
    """Raw conv outputs + get_pred_points (anchor/pred/valid/cls ordering)."""
    ref, ours, params = _make_p2p_pair(
        num_classes=2, point_anchor=((-0.25, -0.25), (0.25, 0.25)))
    rng = np.random.RandomState(30)
    tf, jf = _feat(rng, 2, PAD[0] // 4, PAD[1] // 4, 16)

    with torch.no_grad():
        t_cls, t_pts = ref([tf])
    j_cls, j_pts = ours.apply({"params": params}, [jf])
    np.testing.assert_allclose(
        np.asarray(j_cls[0]), t_cls[0].detach().numpy().transpose(0, 2, 3, 1),
        atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(j_pts[0]), t_pts[0].detach().numpy().transpose(0, 2, 3, 1),
        atol=5e-5, rtol=1e-4)

    with torch.no_grad():
        r_anchor, r_pred, r_valid, r_cls = ref.get_pred_points(
            t_cls, t_pts, _p2p_img_metas(2))
    o_anchor, o_pred, o_valid, o_cls = ours.decode_points(j_cls, j_pts, PAD)
    np.testing.assert_allclose(np.asarray(o_anchor),
                               r_anchor[0].detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_pred),
                               r_pred.detach().numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(o_valid), r_valid[0].detach().numpy().astype(bool))
    np.testing.assert_allclose(np.asarray(o_cls), r_cls.detach().numpy(),
                               atol=5e-5, rtol=1e-4)


def test_p2p_loss_golden():
    """Full loss path on shared weights at topk_k=1 (scipy vs auction)."""
    ref, ours, params = _make_p2p_pair(train_cfg=P2P_TRAIN)
    rng = np.random.RandomState(31)
    b = 2
    tf, jf = _feat(rng, b, PAD[0] // 4, PAD[1] // 4, 16)

    gts = [np.array([[10.0, 12.0, 18.0, 20.0], [40.0, 8.0, 52.0, 22.0],
                     [22.0, 40.0, 30.0, 52.0]], np.float32),
           np.array([[30.0, 30.0, 44.0, 46.0]], np.float32)]
    labels = [np.array([0, 0, 0], np.int64), np.array([0], np.int64)]

    with torch.no_grad():
        t_cls, t_pts = ref([tf])
        ref_losses = ref.loss(
            t_cls, t_pts, [torch.from_numpy(g) for g in gts],
            [torch.from_numpy(l) for l in labels], _p2p_img_metas(b),
            gt_bboxes_ignore=[torch.zeros((0, 4)) for _ in range(b)])
    ref_cls = sum(v.item() for v in ref_losses["loss_cls"])
    ref_pts = sum(v.item() for v in ref_losses["loss_pts"])

    j_cls, j_pts = ours.apply({"params": params}, [jf])
    gmax = 3
    gt_b = np.zeros((b, gmax, 4), np.float32)
    gt_l = np.zeros((b, gmax), np.int32)
    gt_v = np.zeros((b, gmax), bool)
    for i, (g, l) in enumerate(zip(gts, labels)):
        gt_b[i, :len(g)] = g
        gt_l[i, :len(l)] = l
        gt_v[i, :len(g)] = True
    batch = dict(gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
                 gt_valid=jnp.asarray(gt_v), pad_shape=PAD,
                 img_shape=jnp.asarray([[PAD[0], PAD[1]]] * b, jnp.int32))
    out = ours.loss(j_cls, j_pts, batch)
    np.testing.assert_allclose(float(out["loss_cls"]), ref_cls,
                               rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(float(out["loss_pts"]), ref_pts,
                               rtol=3e-4, atol=1e-6)


def test_p2p_get_bboxes_golden():
    """Inference path: per-level topk -> clamp -> pseudo-box NMS ->
    (cx, cy, score) rows (p2p_head.py:330-423)."""
    ref, ours, params = _make_p2p_pair(num_classes=2)
    rng = np.random.RandomState(32)
    b = 2
    tf, jf = _feat(rng, b, PAD[0] // 4, PAD[1] // 4, 16)

    with torch.no_grad():
        t_cls, t_pts = ref([tf])
        ref_res = ref.get_bboxes(t_cls, t_pts, _p2p_img_metas(b))

    j_cls, j_pts = ours.apply({"params": params}, [jf])
    img_shapes = jnp.asarray([[PAD[0], PAD[1]]] * b, jnp.int32)
    dets, pts = ours.get_bboxes(j_cls, j_pts, img_shapes, PAD)

    for i in range(b):
        r_boxes = ref_res[i][0].detach().numpy()     # (n, 5) pseudo + score
        r_labels = ref_res[i][1].detach().numpy()
        m = np.asarray(dets.valid[i])
        g_boxes = np.asarray(dets.bboxes[i])[m]
        g_labels = np.asarray(dets.labels[i])[m]
        g_pts = np.asarray(pts[i])[m]
        r_order = np.argsort(-r_boxes[:, 4], kind="stable")
        g_order = np.argsort(-g_boxes[:, 4], kind="stable")
        r_boxes, r_labels = r_boxes[r_order], r_labels[r_order]
        g_boxes, g_labels, g_pts = (g_boxes[g_order], g_labels[g_order],
                                    g_pts[g_order])
        assert r_boxes.shape[0] == g_boxes.shape[0]
        np.testing.assert_allclose(g_boxes[:, 4], r_boxes[:, 4], atol=1e-4,
                                   rtol=1e-4)
        # reference converts dets to (cx, cy, score); ours returns both the
        # pseudo boxes and the center rows — compare centers too
        r_cxy = (r_boxes[:, :2] + r_boxes[:, 2:4]) / 2
        np.testing.assert_allclose(g_pts[:, :2], r_cxy, atol=2e-3, rtol=1e-4)
        np.testing.assert_allclose(g_boxes[:, :4], r_boxes[:, :4], atol=2e-3,
                                   rtol=1e-4)
        np.testing.assert_array_equal(g_labels, r_labels)


# ===================================================================
# CPR — the Coarse Point Refinement flagship (cpr_head.py:899-1310)
# ===================================================================

def _cpr_cfgs(pos_radius=3, neg_radius=2, with_gt_loss=False,
              refine_bag_policy="independent_with_gt_bag"):
    train_ex = dict(
        pos_generator=dict(type="CirclePtFeatGenerator", radius=pos_radius),
        neg_generator=dict(type="OutCirclePtFeatGenerator",
                           radius=neg_radius))
    refine_ex = dict(
        pos_generator=dict(type="CirclePtFeatGenerator", radius=pos_radius),
        neg_generator=dict(type="AnchorPtFeatGenerator", scale_factor=1.0))
    loss_cfg = dict(with_neg=True, neg_loss_weight=1.0,
                    refine_bag_policy=refine_bag_policy,
                    random_remove_rate=0.0,       # deterministic golden
                    with_gt_loss=with_gt_loss, gt_loss_weight=0.7,
                    with_mil_loss=True)
    return train_ex, refine_ex, loss_cfg


def _make_cpr_pair(num_classes=2, c=16, stacked=2, seed=41, **kw):
    import pointtinybenchmark_tpu.models  # noqa: F401
    from pointtinybenchmark_tpu.models.dense_heads.cpr_head import CPRHead

    train_ex, refine_ex, loss_cfg = _cpr_cfgs(**kw)
    norm = dict(type="GN", num_groups=4, requires_grad=True)
    loss_mil = dict(type="MILLoss", binary_ins=False, loss_weight=1.0)
    normal_cfg = dict(prob_cls_type="sigmoid", out_bg_cls=False)
    point_refiner = dict()

    ref = rl.ref_cpr_head().CPRHead(
        num_classes=num_classes, in_channels=c, feat_channels=c,
        stacked_convs=stacked, strides=[4], num_cls_fcs=0,
        train_pts_extractor=dict(train_ex), refine_pts_extractor=dict(refine_ex),
        point_refiner=dict(point_refiner), loss_mil=dict(loss_mil),
        loss_cfg=dict(loss_cfg), normal_cfg=dict(normal_cfg),
        norm_cfg=rl.make_cfg(norm), train_cfg=None, test_cfg=None)
    _randomize(ref, seed=seed)
    ref.eval()

    ours = CPRHead(num_classes=num_classes, in_channels=c, feat_channels=c,
                   stacked_convs=stacked, strides=(4,),
                   train_pts_extractor=dict(train_ex),
                   refine_pts_extractor=dict(refine_ex),
                   point_refiner=dict(point_refiner),
                   loss_mil=dict(loss_mil), loss_cfg=dict(loss_cfg),
                   normal_cfg=dict(normal_cfg), norm_cfg=dict(norm))
    sd = {"bbox_head." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params, _, unmapped = convert_detector_state_dict(sd, depth=50)
    assert not unmapped, unmapped
    return ref, ours, params["bbox_head_m"]


CPR_GTS = [np.array([[12.0, 14.0], [40.0, 20.0], [24.0, 44.0]], np.float32),
           np.array([[30.0, 34.0]], np.float32)]
CPR_LABELS = [np.array([0, 0, 1], np.int64), np.array([1], np.int64)]


def _cpr_ref_inputs(b=2):
    """Reference-side gt pseudo boxes (16x16 around the point)."""
    gt_bboxes = [torch.from_numpy(np.concatenate(
        [g - 8.0, g + 8.0], axis=-1)) for g in CPR_GTS[:b]]
    gt_labels = [torch.from_numpy(l) for l in CPR_LABELS[:b]]
    return gt_bboxes, gt_labels


def _cpr_batch(b=2, gmax=3):
    gt_p = np.zeros((b, gmax, 1, 2), np.float32)
    gt_l = np.zeros((b, gmax), np.int32)
    gt_v = np.zeros((b, gmax), bool)
    for i in range(b):
        g, l = CPR_GTS[i], CPR_LABELS[i]
        gt_p[i, :len(g), 0] = g
        gt_l[i, :len(l)] = l
        gt_v[i, :len(g)] = True
    return dict(gt_points=jnp.asarray(gt_p), gt_labels=jnp.asarray(gt_l),
                gt_valid=jnp.asarray(gt_v), pad_shape=PAD,
                img_shape=jnp.asarray([[PAD[0], PAD[1]]] * b, jnp.int32))


def _cpr_img_metas(b):
    return [dict(img_shape=PAD + (3,), pad_shape=PAD + (3,),
                 scale_factor=np.ones(4, np.float32)) for _ in range(b)]


@pytest.mark.parametrize("policy", ["independent_with_gt_bag",
                                    "merge_to_gt_bag", "only_refine_bag"])
def test_cpr_loss0_golden(policy):
    """loss0 composition (cpr_head.py:1131-1229): MIL bag loss over
    circle-bag probabilities + negative gfocal normalized by MIL num_pos +
    gt-center gfocal loss, for each refine_bag_policy."""
    ref, ours, params = _make_cpr_pair(with_gt_loss=True,
                                       refine_bag_policy=policy)
    rng = np.random.RandomState(50)
    b = 2
    tf, jf = _feat(rng, b, PAD[0] // 4, PAD[1] // 4, 16)

    gt_bboxes, gt_labels = _cpr_ref_inputs(b)
    with torch.no_grad():
        cls_feat, ins_feat = ref([tf])
        ref_losses = ref.loss(cls_feat, ins_feat, gt_bboxes, gt_labels,
                              _cpr_img_metas(b))

    batch = _cpr_batch(b)
    outputs = ours.apply({"params": params}, [jf], batch, mode="train")
    out = ours.loss(outputs, batch, rng=None)

    np.testing.assert_allclose(float(out["loss_pos"]),
                               ref_losses["pos_loss"].item(),
                               rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(float(out["loss_neg"]),
                               ref_losses["neg_loss"].item(),
                               rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(float(out["loss_gt"]),
                               ref_losses["gt_loss"].item(),
                               rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(float(out["bag_acc"]),
                               ref_losses["bag_acc"].item(),
                               rtol=1e-4, atol=1e-4)


def test_cpr_refine_golden():
    """PointRefiner parity (cpr_head.py:780-866): nearest-gt filter
    (class-wise, the label-0 group has 2 gts), merge_th / gt_alpha
    thresholds, inside-image mask, confidence-weighted merge, refine_th
    fallback, and the (pseudo-box, score, ann_id) output rows."""
    ref, ours, params = _make_cpr_pair()
    rng = np.random.RandomState(51)
    b = 2
    tf, jf = _feat(rng, b, PAD[0] // 4, PAD[1] // 4, 16)

    gt_bboxes, gt_labels = _cpr_ref_inputs(b)
    anns_id = [torch.arange(len(l)) + 100 * i
               for i, l in enumerate(gt_labels)]
    with torch.no_grad():
        cls_feat, ins_feat = ref([tf])
        ref_res = ref.get_bboxes(cls_feat, ins_feat, _cpr_img_metas(b),
                                 gt_bboxes=gt_bboxes, gt_labels=gt_labels,
                                 gt_anns_id=anns_id)

    batch = _cpr_batch(b)
    outputs = ours.apply({"params": params}, [jf], batch, mode="refine")
    pts, scores, not_refine = ours.refine(outputs, batch)

    for i in range(b):
        n = len(CPR_GTS[i])
        r_det = ref_res[i][0].detach().numpy()          # (n, 6)
        r_center = (r_det[:, :2] + r_det[:, 2:4]) / 2
        np.testing.assert_allclose(np.asarray(pts[i])[:n], r_center,
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(scores[i])[:n], r_det[:, 4],
                                   atol=1e-5, rtol=1e-4)


def test_cpr_refine_fallback_golden():
    """refine_th fallback: with a high refine_th every gt falls back to its
    annotated point and (return_score_type='max') zero scores become
    refine_th/2 (cpr_head.py:836-846)."""
    import pointtinybenchmark_tpu.models  # noqa: F401

    import dataclasses

    ref, ours, params = _make_cpr_pair()
    # rebuild the refiners with an impossible threshold on both sides
    ref.point_refiner.refine_th = 10.0
    ref.point_refiner.return_score_type = "max"
    ours = dataclasses.replace(
        ours, point_refiner=dict(refine_th=10.0, return_score_type="max"))
    rng = np.random.RandomState(52)
    b = 1
    tf, jf = _feat(rng, b, PAD[0] // 4, PAD[1] // 4, 16)

    gt_bboxes, gt_labels = _cpr_ref_inputs(b)
    anns_id = [torch.arange(len(l)) for l in gt_labels]
    with torch.no_grad():
        cls_feat, ins_feat = ref([tf])
        ref_res = ref.get_bboxes(cls_feat, ins_feat, _cpr_img_metas(b),
                                 gt_bboxes=gt_bboxes, gt_labels=gt_labels,
                                 gt_anns_id=anns_id)

    batch = _cpr_batch(b)
    outputs = ours.apply({"params": params}, [jf], batch, mode="refine")
    pts, scores, not_refine = ours.refine(outputs, batch)

    n = len(CPR_GTS[0])
    assert bool(np.asarray(not_refine)[0, :n].all())
    r_det = ref_res[0][0].detach().numpy()
    r_center = (r_det[:, :2] + r_det[:, 2:4]) / 2
    np.testing.assert_allclose(np.asarray(pts[0])[:n], r_center, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores[0])[:n], r_det[:, 4],
                               atol=1e-6)
