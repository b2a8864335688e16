"""FULL-DETECTOR golden parity vs the reference torch heads (VERDICT r2 #1).

Composes the exec'd reference heads (tests/reference_loader.py) with the
torch2jax weight converter: identical weights on both sides, identical
synthetic FPN features in, and the complete head pipelines compared —
reference `get_bboxes` (per-level topk -> delta decode -> clip -> rescale ->
multiclass NMS, anchor_head.py:440-616) against our `get_bboxes`, and
reference `AnchorHead.loss` (assign -> sample -> encode -> per-level focal +
L1, anchor_head.py:300-560) against our batched loss. A systematic
head-composition divergence (scale/offset/level-order/score-threshold
placement) fails these tests.

Covered: RetinaHead (Adap TinyPerson shape), RPNHead (proposals + loss),
Shared2FCBBoxHead (second stage forward + get_bboxes on shared RoI feats),
FCOSHead (Adap shape, loss + get_bboxes).
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
IMG_SHAPE = (60, 62)          # < pad: exercises the clip path
ADAP_ANCHOR = dict(type="AnchorGenerator", octave_base_scale=2,
                   scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                   strides=[4, 8, 16, 32, 64])
DELTA_CODER = dict(type="DeltaXYWHBBoxCoder",
                   target_means=[0.0, 0.0, 0.0, 0.0],
                   target_stds=[1.0, 1.0, 1.0, 1.0])
TEST_CFG = dict(nms_pre=200, score_thr=0.05,
                nms=dict(type="nms", iou_threshold=0.5), max_per_img=40)


def _feats(rng, b, c, sizes):
    """Shared synthetic FPN features: torch NCHW + jax NHWC."""
    fs = [rng.randn(b, h, w, c).astype(np.float32) * 0.5 for h, w in sizes]
    t = [torch.from_numpy(f.transpose(0, 3, 1, 2)).contiguous() for f in fs]
    j = [jnp.asarray(f) for f in fs]
    return t, j


def _sizes(pad, strides):
    return [(pad[0] // s, pad[1] // s) for s in strides]


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.normal_(0.0, 0.05, generator=g)
    return module


def _our_dets_to_np(dets):
    """(DetResult batch) -> list of (n,5) float + (n,) labels, score-desc."""
    out = []
    bxs, lbl, valid = (np.asarray(dets.bboxes), np.asarray(dets.labels),
                       np.asarray(dets.valid))
    for i in range(bxs.shape[0]):
        m = valid[i]
        b = bxs[i][m]
        l = lbl[i][m]
        order = np.argsort(-b[:, 4], kind="stable")
        out.append((b[order], l[order]))
    return out


def _ref_dets_to_np(res):
    out = []
    for det, lab in res:
        det = det.detach().numpy()
        lab = lab.detach().numpy()
        order = np.argsort(-det[:, 4], kind="stable")
        out.append((det[order], lab[order]))
    return out


def _assert_dets_match(ref, got, atol_box=2e-3, atol_score=1e-4):
    assert len(ref) == len(got)
    for (rb, rl_), (gb, gl) in zip(ref, got):
        assert rb.shape[0] == gb.shape[0], (rb.shape, gb.shape)
        np.testing.assert_allclose(gb[:, 4], rb[:, 4], atol=atol_score,
                                   rtol=1e-4)
        np.testing.assert_allclose(gb[:, :4], rb[:, :4], atol=atol_box,
                                   rtol=1e-4)
        np.testing.assert_array_equal(gl, rl_)


# ===================================================================
# RetinaHead — the Adap TinyPerson protocol head shape
# ===================================================================

def _make_retina_pair(num_classes=1, c=16, stacked=2, train_cfg=None):
    import pointtinybenchmark_tpu.models  # noqa: F401 — registers heads
    from pointtinybenchmark_tpu.models.dense_heads.retina_head import RetinaHead

    loss_cls = dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                    alpha=0.25, loss_weight=1.0)
    loss_bbox = dict(type="L1Loss", loss_weight=1.0)
    ref = rl.ref_dense_heads().RetinaHead(
        num_classes=num_classes, in_channels=c, feat_channels=c,
        stacked_convs=stacked, anchor_generator=dict(ADAP_ANCHOR),
        bbox_coder=dict(DELTA_CODER), loss_cls=dict(loss_cls),
        loss_bbox=dict(loss_bbox),
        train_cfg=rl.make_cfg(train_cfg) if train_cfg else None,
        test_cfg=rl.make_cfg(TEST_CFG))
    _randomize(ref, seed=7)
    ref.eval()

    ours = RetinaHead(num_classes=num_classes, in_channels=c,
                      feat_channels=c, stacked_convs=stacked,
                      anchor_generator=dict(ADAP_ANCHOR),
                      bbox_coder=dict(DELTA_CODER), loss_cls=dict(loss_cls),
                      loss_bbox=dict(loss_bbox), train_cfg=train_cfg,
                      test_cfg=dict(TEST_CFG))
    sd = {"bbox_head." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params, _, unmapped = convert_detector_state_dict(sd, depth=50)
    assert not unmapped, unmapped
    return ref, ours, params["bbox_head_m"]


def test_retina_head_forward_and_get_bboxes_golden():
    ref, ours, params = _make_retina_pair()
    rng = np.random.RandomState(0)
    sizes = _sizes(PAD, [4, 8, 16, 32, 64])
    tf, jf = _feats(rng, 2, 16, sizes)

    with torch.no_grad():
        t_cls, t_reg = ref(tf)
    j_cls, j_reg = ours.apply({"params": params}, jf)

    # raw per-level outputs match (NCHW vs NHWC transposed)
    for tc, jc in zip(t_cls, j_cls):
        np.testing.assert_allclose(
            np.asarray(jc), tc.detach().numpy().transpose(0, 2, 3, 1),
            atol=5e-5, rtol=1e-4)

    sf = np.array([1.2, 0.9, 1.2, 0.9], np.float32)
    img_metas = [dict(img_shape=IMG_SHAPE + (3,), scale_factor=sf,
                      pad_shape=PAD + (3,)) for _ in range(2)]
    with torch.no_grad():
        ref_res = ref.get_bboxes(t_cls, t_reg, img_metas, rescale=True)

    img_shapes = jnp.asarray([[IMG_SHAPE[0], IMG_SHAPE[1]]] * 2, jnp.int32)
    sfs = jnp.asarray(np.tile(sf, (2, 1)))
    dets, _ = ours.get_bboxes(j_cls, j_reg, img_shapes, PAD,
                              scale_factors=sfs, rescale=True)
    _assert_dets_match(_ref_dets_to_np(ref_res), _our_dets_to_np(dets))


def test_retina_head_loss_golden():
    """Full loss-path parity, incl. an empty-gt image (the per-image
    max(pos,1) normalization, anchor_head.py get_targets)."""
    train_cfg = dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                   neg_iou_thr=0.4, min_pos_iou=0.0,
                                   ignore_iof_thr=-1),
                     allowed_border=-1, pos_weight=-1, debug=False)
    ref, ours, params = _make_retina_pair(num_classes=3,
                                          train_cfg=train_cfg)
    rng = np.random.RandomState(1)
    sizes = _sizes(PAD, [4, 8, 16, 32, 64])
    tf, jf = _feats(rng, 2, 16, sizes)

    gts = [np.array([[4.0, 6.0, 20.0, 26.0], [30.0, 10.0, 56.0, 40.0],
                     [8.0, 40.0, 22.0, 60.0]], np.float32),
           np.zeros((0, 4), np.float32)]
    labels = [np.array([0, 2, 1], np.int64), np.zeros((0,), np.int64)]

    with torch.no_grad():
        t_cls, t_reg = ref(tf)
        img_metas = [dict(img_shape=PAD + (3,), pad_shape=PAD + (3,))
                     for _ in range(2)]
        ref_losses = ref.loss(t_cls, t_reg,
                              [torch.from_numpy(g) for g in gts],
                              [torch.from_numpy(l) for l in labels],
                              img_metas)
    ref_cls = sum(v.item() for v in ref_losses["loss_cls"])
    ref_box = sum(v.item() for v in ref_losses["loss_bbox"])

    j_cls, j_reg = ours.apply({"params": params}, jf)
    gmax = 3
    gt_b = np.zeros((2, gmax, 4), np.float32)
    gt_l = np.zeros((2, gmax), np.int32)
    gt_v = np.zeros((2, gmax), bool)
    for i, (g, l) in enumerate(zip(gts, labels)):
        gt_b[i, :len(g)] = g
        gt_l[i, :len(l)] = l
        gt_v[i, :len(g)] = True
    batch = dict(gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
                 gt_valid=jnp.asarray(gt_v), pad_shape=PAD)
    out = ours.loss(j_cls, j_reg, batch)
    np.testing.assert_allclose(float(out["loss_cls"]), ref_cls,
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(out["loss_bbox"]), ref_box,
                               rtol=2e-4, atol=1e-5)


# ===================================================================
# RPNHead — proposal generation (rpn_head.py:78-…) and CE-sampling loss
# ===================================================================

RPN_ANCHOR = dict(type="AnchorGenerator", scales=[2],
                  ratios=[0.5, 1.0, 2.0], strides=[4, 8, 16, 32, 64])
RPN_TEST = dict(nms_pre=120, max_per_img=60,
                nms=dict(type="nms", iou_threshold=0.7), min_bbox_size=0)


def _make_rpn_pair(train_cfg=None):
    import pointtinybenchmark_tpu.models  # noqa: F401
    from pointtinybenchmark_tpu.models.dense_heads.rpn_head import RPNHead

    loss_cls = dict(type="CrossEntropyLoss", use_sigmoid=True,
                    loss_weight=1.0)
    loss_bbox = dict(type="L1Loss", loss_weight=1.0)
    ref = rl.ref_dense_heads().RPNHead(
        in_channels=16, feat_channels=16,
        anchor_generator=dict(RPN_ANCHOR), bbox_coder=dict(DELTA_CODER),
        loss_cls=dict(loss_cls), loss_bbox=dict(loss_bbox),
        train_cfg=rl.make_cfg(train_cfg) if train_cfg else None,
        test_cfg=rl.make_cfg(RPN_TEST))
    _randomize(ref, seed=3)
    ref.eval()

    ours = RPNHead(num_classes=1, in_channels=16, feat_channels=16,
                   anchor_generator=dict(RPN_ANCHOR),
                   bbox_coder=dict(DELTA_CODER), loss_cls=dict(loss_cls),
                   loss_bbox=dict(loss_bbox), train_cfg=train_cfg,
                   test_cfg=dict(RPN_TEST))
    sd = {"rpn_head." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params, _, unmapped = convert_detector_state_dict(sd, depth=50)
    assert not unmapped, unmapped
    return ref, ours, params["rpn_head_m"]


def test_rpn_head_proposals_golden():
    ref, ours, params = _make_rpn_pair()
    rng = np.random.RandomState(2)
    sizes = _sizes(PAD, [4, 8, 16, 32, 64])
    tf, jf = _feats(rng, 2, 16, sizes)

    with torch.no_grad():
        t_cls, t_reg = ref(tf)
        img_metas = [dict(img_shape=IMG_SHAPE + (3,),
                          scale_factor=np.ones(4, np.float32),
                          pad_shape=PAD + (3,)) for _ in range(2)]
        ref_props = ref.get_bboxes(t_cls, t_reg, img_metas)

    j_cls, j_reg = ours.apply({"params": params}, jf)
    img_shapes = jnp.asarray([[IMG_SHAPE[0], IMG_SHAPE[1]]] * 2, jnp.int32)
    boxes, scores, valid = ours.get_proposals(j_cls, j_reg, img_shapes, PAD,
                                              dict(RPN_TEST))
    for i in range(2):
        rdet = ref_props[i].detach().numpy()
        m = np.asarray(valid[i])
        gb = np.asarray(boxes[i])[m]
        gs = np.asarray(scores[i])[m]
        order = np.argsort(-gs, kind="stable")
        gb, gs = gb[order], gs[order]
        assert rdet.shape[0] == gb.shape[0], (rdet.shape, gb.shape)
        np.testing.assert_allclose(gs, rdet[:, 4], atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(gb, rdet[:, :4], atol=2e-3, rtol=1e-4)


def test_rpn_head_loss_golden():
    """CE-with-sampling branch: no sampler key -> the reference uses
    PseudoSampler (all anchors), which is deterministic on both sides."""
    train_cfg = dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                   neg_iou_thr=0.3, min_pos_iou=0.3,
                                   match_low_quality=True,
                                   ignore_iof_thr=-1),
                     allowed_border=-1, pos_weight=-1, debug=False)
    ref, ours, params = _make_rpn_pair(train_cfg=train_cfg)
    rng = np.random.RandomState(4)
    sizes = _sizes(PAD, [4, 8, 16, 32, 64])
    tf, jf = _feats(rng, 2, 16, sizes)

    gts = [np.array([[4.0, 6.0, 20.0, 26.0], [30.0, 10.0, 56.0, 40.0]],
                    np.float32),
           np.array([[10.0, 12.0, 40.0, 44.0]], np.float32)]
    with torch.no_grad():
        t_cls, t_reg = ref(tf)
        img_metas = [dict(img_shape=PAD + (3,), pad_shape=PAD + (3,))
                     for _ in range(2)]
        ref_losses = ref.loss(t_cls, t_reg,
                              [torch.from_numpy(g) for g in gts], img_metas)
    ref_cls = sum(v.item() for v in ref_losses["loss_rpn_cls"])
    ref_box = sum(v.item() for v in ref_losses["loss_rpn_bbox"])

    j_cls, j_reg = ours.apply({"params": params}, jf)
    gmax = 2
    gt_b = np.zeros((2, gmax, 4), np.float32)
    gt_v = np.zeros((2, gmax), bool)
    for i, g in enumerate(gts):
        gt_b[i, :len(g)] = g
        gt_v[i, :len(g)] = True
    batch = dict(gt_bboxes=jnp.asarray(gt_b),
                 gt_labels=jnp.zeros((2, gmax), jnp.int32),
                 gt_valid=jnp.asarray(gt_v), pad_shape=PAD)
    out = ours.loss(j_cls, j_reg, batch)
    np.testing.assert_allclose(float(out["loss_cls"]), ref_cls,
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(out["loss_bbox"]), ref_box,
                               rtol=2e-4, atol=1e-6)


# ===================================================================
# Shared2FCBBoxHead — the Faster R-CNN second stage on shared proposals
# (SingleRoIExtractor level routing + fc head + per-class decode + NMS)
# ===================================================================

def test_roi_stage_golden():
    import jax
    import pointtinybenchmark_tpu.models  # noqa: F401
    from pointtinybenchmark_tpu.models.roi_heads.standard_roi_head import (
        StandardRoIHead)

    nc = 2
    rcnn_test = dict(score_thr=0.05, nms=dict(type="nms", iou_threshold=0.5),
                     max_per_img=30)
    coder = dict(type="DeltaXYWHBBoxCoder",
                 target_means=[0.0, 0.0, 0.0, 0.0],
                 target_stds=[0.1, 0.1, 0.2, 0.2])
    bb = rl.ref_bbox_heads()
    ref_head = bb.Shared2FCBBoxHead(
        in_channels=16, fc_out_channels=32, roi_feat_size=7, num_classes=nc,
        bbox_coder=dict(coder),
        loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=False,
                      loss_weight=1.0),
        loss_bbox=dict(type="L1Loss", loss_weight=1.0))
    _randomize(ref_head, seed=11)
    ref_head.eval()
    ref_ext = rl.ref_roi_extractor().SingleRoIExtractor(
        roi_layer=dict(type="RoIAlign", output_size=7, sampling_ratio=2),
        out_channels=16, featmap_strides=[4, 8, 16, 32])

    ours = StandardRoIHead(
        bbox_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=7,
                           sampling_ratio=2),
            out_channels=16, featmap_strides=[4, 8, 16, 32]),
        bbox_head=dict(type="Shared2FCBBoxHead", num_classes=nc,
                       in_channels=16, fc_out_channels=32, roi_feat_size=7,
                       bbox_coder=dict(coder)),
        test_cfg=dict(rcnn_test))
    sd = {"roi_head.bbox_head." + k: v.detach().numpy()
          for k, v in ref_head.state_dict().items()}
    params, _, unmapped = convert_detector_state_dict(sd, depth=50)
    assert not unmapped, unmapped

    rng = np.random.RandomState(5)
    sizes = _sizes(PAD, [4, 8, 16, 32])
    tf, jf = _feats(rng, 2, 16, sizes)

    # proposals spanning multiple FPN levels (tiny + large areas)
    props = np.array([
        [[2.0, 3.0, 14.0, 17.0], [4.0, 4.0, 60.0, 60.0],
         [20.0, 8.0, 32.0, 40.0], [0.0, 0.0, 63.0, 30.0]],
        [[5.0, 5.0, 11.0, 12.0], [10.0, 20.0, 58.0, 62.0],
         [30.0, 30.0, 44.0, 47.0], [1.0, 2.0, 30.0, 61.0]]], np.float32)
    b, p = props.shape[:2]

    # --- reference: bbox2roi -> extractor -> head -> per-image get_bboxes
    t = rl.ref_transforms()
    rois = t.bbox2roi([torch.from_numpy(pr) for pr in props])
    with torch.no_grad():
        roi_feats = ref_ext(tf, rois)
        cls_score, bbox_pred = ref_head(roi_feats)
        ref_res = []
        for i in range(b):
            sel = rois[:, 0] == i
            det, lab = ref_head.get_bboxes(
                rois[sel], cls_score[sel], bbox_pred[sel],
                IMG_SHAPE + (3,), np.ones(4, np.float32), rescale=False,
                cfg=rl.make_cfg(rcnn_test))
            ref_res.append((det, lab))

    # --- ours: same proposals, full valid mask
    img_shapes = jnp.asarray([[IMG_SHAPE[0], IMG_SHAPE[1]]] * b, jnp.int32)
    variables = {"params": params["roi_head_m"]}
    dets = ours.apply(variables, jf, jnp.asarray(props),
                      jnp.ones((b, p), bool), img_shapes,
                      method=ours.simple_test)
    _assert_dets_match(_ref_dets_to_np(ref_res), _our_dets_to_np(dets))


# ===================================================================
# FCOSHead — Adap TinyPerson shape (compressed regress_ranges, GN towers)
# ===================================================================

ADAP_RANGES = ((-1, 16), (16, 32), (32, 64), (64, 128), (128, 1e8))


def _make_fcos_pair(num_classes=2, c=16, stacked=2):
    import pointtinybenchmark_tpu.models  # noqa: F401
    from pointtinybenchmark_tpu.models.dense_heads.fcos_head import FCOSHead

    loss_cls = dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                    alpha=0.25, loss_weight=1.0)
    loss_bbox = dict(type="IoULoss", loss_weight=1.0)
    loss_ctr = dict(type="CrossEntropyLoss", use_sigmoid=True,
                    loss_weight=1.0)
    ref = rl.ref_fcos_head().FCOSHead(
        num_classes=num_classes, in_channels=c, feat_channels=c,
        stacked_convs=stacked, strides=[4, 8, 16, 32, 64],
        regress_ranges=ADAP_RANGES,
        norm_cfg=dict(type="GN", num_groups=4, requires_grad=True),
        loss_cls=dict(loss_cls), loss_bbox=dict(loss_bbox),
        loss_centerness=dict(loss_ctr),
        train_cfg=None, test_cfg=rl.make_cfg(TEST_CFG))
    _randomize(ref, seed=13)
    ref.eval()

    ours = FCOSHead(num_classes=num_classes, in_channels=c, feat_channels=c,
                    stacked_convs=stacked, strides=(4, 8, 16, 32, 64),
                    regress_ranges=ADAP_RANGES,
                    norm_cfg=dict(type="GN", num_groups=4),
                    loss_cls=dict(loss_cls), loss_bbox=dict(loss_bbox),
                    loss_centerness=dict(loss_ctr),
                    test_cfg=dict(TEST_CFG))
    sd = {"bbox_head." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params, _, unmapped = convert_detector_state_dict(sd, depth=50)
    assert not unmapped, unmapped
    return ref, ours, params["bbox_head_m"]


def test_fcos_head_forward_and_get_bboxes_golden():
    ref, ours, params = _make_fcos_pair()
    rng = np.random.RandomState(6)
    sizes = _sizes(PAD, [4, 8, 16, 32, 64])
    tf, jf = _feats(rng, 2, 16, sizes)

    with torch.no_grad():
        t_cls, t_reg, t_ctr = ref(tf)
    j_cls, j_reg, j_ctr = ours.apply({"params": params}, jf)
    for tc, jc in zip(t_cls, j_cls):
        np.testing.assert_allclose(
            np.asarray(jc), tc.detach().numpy().transpose(0, 2, 3, 1),
            atol=5e-5, rtol=1e-4)
    for tr, jr in zip(t_reg, j_reg):
        np.testing.assert_allclose(
            np.asarray(jr), tr.detach().numpy().transpose(0, 2, 3, 1),
            atol=5e-4, rtol=1e-4)

    sf = np.array([1.1, 0.8, 1.1, 0.8], np.float32)
    img_metas = [dict(img_shape=IMG_SHAPE + (3,), scale_factor=sf,
                      pad_shape=PAD + (3,)) for _ in range(2)]
    with torch.no_grad():
        ref_res = ref.get_bboxes(t_cls, t_reg, t_ctr, img_metas,
                                 rescale=True)
    img_shapes = jnp.asarray([[IMG_SHAPE[0], IMG_SHAPE[1]]] * 2, jnp.int32)
    sfs = jnp.asarray(np.tile(sf, (2, 1)))
    dets, _ = ours.get_bboxes(j_cls, j_reg, j_ctr, img_shapes, PAD,
                              scale_factors=sfs, rescale=True)
    _assert_dets_match(_ref_dets_to_np(ref_res), _our_dets_to_np(dets),
                       atol_box=3e-3, atol_score=2e-4)


def test_fcos_head_loss_golden():
    ref, ours, params = _make_fcos_pair()
    rng = np.random.RandomState(8)
    sizes = _sizes(PAD, [4, 8, 16, 32, 64])
    tf, jf = _feats(rng, 2, 16, sizes)

    gts = [np.array([[4.0, 6.0, 16.0, 18.0], [30.0, 10.0, 58.0, 44.0],
                     [8.0, 40.0, 26.0, 60.0]], np.float32),
           np.array([[12.0, 12.0, 36.0, 30.0]], np.float32)]
    labels = [np.array([0, 1, 1], np.int64), np.array([0], np.int64)]

    with torch.no_grad():
        t_cls, t_reg, t_ctr = ref(tf)
        img_metas = [dict(img_shape=PAD + (3,), pad_shape=PAD + (3,))
                     for _ in range(2)]
        ref_losses = ref.loss(t_cls, t_reg, t_ctr,
                              [torch.from_numpy(g) for g in gts],
                              [torch.from_numpy(l) for l in labels],
                              img_metas)

    j_cls, j_reg, j_ctr = ours.apply({"params": params}, jf)
    gmax = 3
    gt_b = np.zeros((2, gmax, 4), np.float32)
    gt_l = np.zeros((2, gmax), np.int32)
    gt_v = np.zeros((2, gmax), bool)
    for i, (g, l) in enumerate(zip(gts, labels)):
        gt_b[i, :len(g)] = g
        gt_l[i, :len(l)] = l
        gt_v[i, :len(g)] = True
    batch = dict(gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
                 gt_valid=jnp.asarray(gt_v), pad_shape=PAD)
    out = ours.loss(j_cls, j_reg, j_ctr, batch)
    for k in ("loss_cls", "loss_bbox", "loss_centerness"):
        np.testing.assert_allclose(float(out[k]), ref_losses[k].item(),
                                   rtol=3e-4, atol=1e-5,
                                   err_msg=k)


def test_fcos_get_bboxes_score_thr_gates_raw_score():
    """Discriminating case for the score_factors contract: with random
    weights, raw sigmoid scores sit near 0.5 and score*centerness near 0.25.
    score_thr=0.4 keeps candidates ONLY if the threshold gates the raw score
    (reference bbox_nms.py:55-62); thresholding the product keeps none."""
    ref, ours, params = _make_fcos_pair()
    rng = np.random.RandomState(9)
    sizes = _sizes(PAD, [4, 8, 16, 32, 64])
    tf, jf = _feats(rng, 1, 16, sizes)

    cfg = dict(TEST_CFG)
    cfg["score_thr"] = 0.4
    with torch.no_grad():
        t_cls, t_reg, t_ctr = ref(tf)
        img_metas = [dict(img_shape=PAD + (3,),
                          scale_factor=np.ones(4, np.float32),
                          pad_shape=PAD + (3,))]
        ref_res = ref.get_bboxes(t_cls, t_reg, t_ctr, img_metas,
                                 cfg=rl.make_cfg(cfg), rescale=False)
    assert ref_res[0][0].shape[0] > 0, "degenerate fixture"

    ours2 = ours.replace(test_cfg=cfg) if hasattr(ours, "replace") else ours
    j_cls, j_reg, j_ctr = ours2.apply({"params": params}, jf)
    img_shapes = jnp.asarray([[PAD[0], PAD[1]]], jnp.int32)
    dets, _ = ours2.get_bboxes(j_cls, j_reg, j_ctr, img_shapes, PAD)
    _assert_dets_match(_ref_dets_to_np(ref_res), _our_dets_to_np(dets),
                       atol_box=3e-3, atol_score=2e-4)
