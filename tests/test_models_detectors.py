"""Forward/backward smoke for the detector baselines (reference test
strategy: tests/test_models/test_forward.py `_demo_mm_inputs` pattern)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.models import build_detector


def _demo_batch(b=2, g=5, num_classes=2, seed=1):
    rng = np.random.RandomState(seed)
    bb = rng.rand(b, g, 4).astype(np.float32) * 30
    bb[..., 2:] = bb[..., :2] + 6 + rng.rand(b, g, 2).astype(np.float32) * 20
    return dict(gt_bboxes=jnp.asarray(bb),
                gt_labels=jnp.asarray(rng.randint(0, num_classes, (b, g)),
                                      jnp.int32),
                gt_valid=jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 0, 0, 0]], bool),
                img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32))


def _retina():
    return build_detector(
        dict(type="SingleStageDetector",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0,
                       add_extra_convs="on_input", num_outs=5),
             bbox_head=dict(
                 type="RetinaHead", num_classes=2, in_channels=16,
                 feat_channels=16, stacked_convs=1,
                 anchor_generator=dict(type="AnchorGenerator",
                                       octave_base_scale=2,
                                       scales_per_octave=3,
                                       ratios=[0.5, 1.0, 2.0],
                                       strides=[4, 8, 16, 32, 64]),
                 bbox_coder=dict(target_means=[0, 0, 0, 0],
                                 target_stds=[1, 1, 1, 1]),
                 loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                               alpha=0.25, loss_weight=1.0),
                 loss_bbox=dict(type="L1Loss", loss_weight=1.0))),
        dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                           neg_iou_thr=0.4, min_pos_iou=0,
                           ignore_iof_thr=-1),
             allowed_border=-1, pos_weight=-1),
        dict(nms_pre=200, score_thr=0.05,
             nms=dict(type="nms", iou_threshold=0.5), max_per_img=50))


def _fcos():
    return build_detector(
        dict(type="SingleStageDetector",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0, add_extra_convs=True,
                       relu_before_extra_convs=True, num_outs=5),
             bbox_head=dict(
                 type="FCOSHead", num_classes=2, in_channels=16,
                 feat_channels=16, stacked_convs=1,
                 strides=[4, 8, 16, 32, 64],
                 regress_ranges=((-1, 16), (16, 32), (32, 64), (64, 128),
                                 (128, 1e8)),
                 norm_cfg=dict(type="GN", num_groups=4),
                 loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                               alpha=0.25, loss_weight=1.0),
                 loss_bbox=dict(type="IoULoss", loss_weight=1.0))),
        None,
        dict(nms_pre=200, score_thr=0.05,
             nms=dict(type="nms", iou_threshold=0.5), max_per_img=50))


def _frcnn():
    return build_detector(
        dict(type="FasterRCNN",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0, num_outs=5),
             rpn_head=dict(
                 type="RPNHead", num_classes=1, in_channels=16,
                 feat_channels=16,
                 anchor_generator=dict(type="AnchorGenerator", scales=[2],
                                       ratios=[0.5, 1.0, 2.0],
                                       strides=[4, 8, 16, 32, 64]),
                 bbox_coder=dict(target_means=[0, 0, 0, 0],
                                 target_stds=[1, 1, 1, 1]),
                 loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True,
                               loss_weight=1.0),
                 loss_bbox=dict(type="L1Loss", loss_weight=1.0)),
             roi_head=dict(
                 type="StandardRoIHead",
                 bbox_roi_extractor=dict(
                     roi_layer=dict(type="RoIAlign", output_size=7,
                                    sampling_ratio=0),
                     out_channels=16, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(
                     type="Shared2FCBBoxHead", num_classes=2, in_channels=16,
                     fc_out_channels=64, roi_feat_size=7,
                     bbox_coder=dict(target_means=[0, 0, 0, 0],
                                     target_stds=[0.1, 0.1, 0.2, 0.2]),
                     loss_cls=dict(type="CrossEntropyLoss", loss_weight=1.0),
                     loss_bbox=dict(type="L1Loss", loss_weight=1.0)))),
        dict(rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                    neg_iou_thr=0.3, min_pos_iou=0.3,
                                    match_low_quality=True,
                                    ignore_iof_thr=-1),
                      sampler=dict(type="RandomSampler", num=256,
                                   pos_fraction=0.5),
                      allowed_border=-1, pos_weight=-1),
             rpn_proposal=dict(nms_pre=200, max_per_img=100,
                               nms=dict(iou_threshold=0.7), min_bbox_size=0),
             rcnn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                     neg_iou_thr=0.5, min_pos_iou=0.5,
                                     match_low_quality=False,
                                     ignore_iof_thr=-1),
                       sampler=dict(type="RandomSampler", num=64,
                                    pos_fraction=0.25,
                                    add_gt_as_proposals=True),
                       pos_weight=-1)),
        dict(rpn=dict(nms_pre=200, max_per_img=100,
                      nms=dict(iou_threshold=0.7), min_bbox_size=0),
             rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                       max_per_img=30)))


@pytest.mark.parametrize("builder,needs_rng", [
    (_retina, False), (_fcos, False), (_frcnn, True)])
def test_detector_forward_backward(builder, needs_rng):
    model = builder()
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    batch = _demo_batch()
    variables = model.init(jax.random.PRNGKey(0), img)
    rngs = {"sampler": jax.random.PRNGKey(3)} if needs_rng else {}
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"], rngs=rngs)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(losses.get("num_pos", losses.get("rpn_num_pos"))) > 0

    def total(v):
        l, _ = model.apply(v, img, batch, method=model.forward_train,
                           mutable=["batch_stats"], rngs=rngs)
        return sum(x for k, x in l.items() if k.startswith("loss"))

    g = jax.grad(total)(variables)
    gn = sum(float(jnp.abs(x).sum())
             for x in jax.tree_util.tree_leaves(g["params"]))
    assert np.isfinite(gn) and gn > 0

    dets, _ = model.apply(variables, img,
                          jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape[0] == 2
    assert dets.bboxes.shape[2] == 5


def test_retina_adap_anchor_scales():
    """Adap recipe: octave_base_scale=2 makes the smallest anchor 8px at
    stride 4 (vs 32px stock) — the core tiny-object change."""
    from pointtinybenchmark_tpu.core import AnchorGenerator
    adap = AnchorGenerator(octave_base_scale=2, scales_per_octave=3,
                           ratios=[1.0], strides=[4])
    stock = AnchorGenerator(octave_base_scale=4, scales_per_octave=3,
                            ratios=[1.0], strides=[8])
    a = np.asarray(adap.base_anchors[0])
    s = np.asarray(stock.base_anchors[0])
    assert (a[0, 2] - a[0, 0]) == pytest.approx(8.0)
    assert (s[0, 2] - s[0, 0]) == pytest.approx(32.0)


def test_atss_assign_and_losses():
    from pointtinybenchmark_tpu.models.dense_heads.atss_head import atss_assign
    # two levels of anchors; one gt -> adaptive threshold picks center anchors
    anchors = []
    for s in (4, 8):
        for y in range(4):
            for x in range(4):
                cx, cy = x * s + s / 2, y * s + s / 2
                anchors.append([cx - s, cy - s, cx + s, cy + s])
    anchors = np.asarray(anchors, np.float32)
    gts = jnp.asarray([[3.0, 3.0, 12.0, 12.0]])  # asymmetric: clear best
    assigned = atss_assign(anchors, [16, 16], gts, jnp.asarray([True]),
                           topk=4)
    a = np.asarray(assigned)
    assert (a > 0).sum() >= 1
    # all positives have centers inside the gt
    for i in np.where(a > 0)[0]:
        cx = (anchors[i, 0] + anchors[i, 2]) / 2
        cy = (anchors[i, 1] + anchors[i, 3]) / 2
        assert 3 < cx < 12 and 3 < cy < 12

    model = build_detector(
        dict(type="SingleStageDetector",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0,
                       add_extra_convs="on_input", num_outs=5),
             bbox_head=dict(type="ATSSHead", num_classes=2, in_channels=16,
                            feat_channels=16, stacked_convs=1,
                            norm_cfg=dict(type="GN", num_groups=4),
                            anchor_generator=dict(type="AnchorGenerator",
                                                  ratios=[1.0],
                                                  octave_base_scale=2,
                                                  scales_per_octave=1,
                                                  strides=[4, 8, 16, 32, 64]),
                            bbox_coder=dict(target_means=[0, 0, 0, 0],
                                            target_stds=[0.1, 0.1, 0.2, 0.2]),
                            loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                          gamma=2.0, alpha=0.25,
                                          loss_weight=1.0),
                            loss_bbox=dict(type="GIoULoss", loss_weight=2.0))),
        dict(assigner=dict(type="ATSSAssigner", topk=9),
             allowed_border=-1, pos_weight=-1),
        dict(nms_pre=200, score_thr=0.05,
             nms=dict(type="nms", iou_threshold=0.6), max_per_img=50))
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    batch = _demo_batch()
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert float(losses["num_pos"]) > 0
    dets, _ = model.apply(variables, img, jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape[2] == 5


def test_gfl_head():
    from pointtinybenchmark_tpu.models.losses import (DistributionFocalLoss,
                                                      QualityFocalLoss)
    # DFL: point mass exactly on integer target -> loss ~0
    pred = jnp.asarray([[10., -10., -10.]])
    tgt = jnp.asarray([0.0])
    assert float(DistributionFocalLoss(loss_weight=1.0)(pred, tgt)) < 1e-3
    # fractional target: best distribution splits adjacent bins
    pred2 = jnp.asarray([[5., 5., -10.]])
    tgt2 = jnp.asarray([0.5])
    l_split = float(DistributionFocalLoss(loss_weight=1.0)(pred2, tgt2))
    l_point = float(DistributionFocalLoss(loss_weight=1.0)(pred, tgt2))
    assert l_split < l_point

    # QFL: perfect prediction of quality -> smaller loss than wrong
    logits_good = jnp.asarray([[jnp.log(0.8 / 0.2), -5.0]])
    logits_bad = jnp.asarray([[-5.0, -5.0]])
    labels = jnp.asarray([0])
    scores = jnp.asarray([0.8])
    qfl = QualityFocalLoss(loss_weight=1.0)
    assert float(qfl(logits_good, (labels, scores))) < \
        float(qfl(logits_bad, (labels, scores)))

    model = build_detector(
        dict(type="SingleStageDetector",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0,
                       add_extra_convs="on_input", num_outs=5),
             bbox_head=dict(type="GFLHead", num_classes=2, in_channels=16,
                            feat_channels=16, stacked_convs=1, reg_max=8,
                            norm_cfg=dict(type="GN", num_groups=4),
                            anchor_generator=dict(type="AnchorGenerator",
                                                  ratios=[1.0],
                                                  octave_base_scale=2,
                                                  scales_per_octave=1,
                                                  strides=[4, 8, 16, 32, 64]))),
        dict(assigner=dict(type="ATSSAssigner", topk=9),
             allowed_border=-1, pos_weight=-1),
        dict(nms_pre=200, score_thr=0.05,
             nms=dict(type="nms", iou_threshold=0.6), max_per_img=50))
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    batch = _demo_batch()
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert float(losses["num_pos"]) > 0
    dets, _ = model.apply(variables, img, jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape[2] == 5


def test_cascade_rcnn():
    stage_head = dict(type="Shared2FCBBoxHead", num_classes=2,
                      in_channels=16, fc_out_channels=32, roi_feat_size=7,
                      bbox_coder=dict(target_means=[0, 0, 0, 0],
                                      target_stds=[0.1, 0.1, 0.2, 0.2]),
                      loss_cls=dict(type="CrossEntropyLoss", loss_weight=1.0),
                      loss_bbox=dict(type="SmoothL1Loss", beta=1.0,
                                     loss_weight=1.0))
    rcnn_stages = [
        dict(assigner=dict(pos_iou_thr=thr, neg_iou_thr=thr, min_pos_iou=thr,
                           match_low_quality=False, ignore_iof_thr=-1),
             sampler=dict(num=32, pos_fraction=0.25,
                          add_gt_as_proposals=(thr == 0.5)))
        for thr in (0.5, 0.6, 0.7)]
    model = build_detector(
        dict(type="CascadeRCNN",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0, num_outs=5),
             rpn_head=dict(type="RPNHead", num_classes=1, in_channels=16,
                           feat_channels=16,
                           anchor_generator=dict(type="AnchorGenerator",
                                                 scales=[2],
                                                 ratios=[0.5, 1.0, 2.0],
                                                 strides=[4, 8, 16, 32, 64]),
                           bbox_coder=dict(target_means=[0, 0, 0, 0],
                                           target_stds=[1, 1, 1, 1]),
                           loss_cls=dict(type="CrossEntropyLoss",
                                         use_sigmoid=True, loss_weight=1.0),
                           loss_bbox=dict(type="L1Loss", loss_weight=1.0)),
             roi_head=dict(type="CascadeRoIHead", num_stages=3,
                           stage_loss_weights=[1.0, 0.5, 0.25],
                           bbox_roi_extractor=dict(
                               roi_layer=dict(type="RoIAlign", output_size=7,
                                              sampling_ratio=0),
                               out_channels=16,
                               featmap_strides=[4, 8, 16, 32]),
                           bbox_head=[stage_head] * 3)),
        dict(rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                    neg_iou_thr=0.3, min_pos_iou=0.3,
                                    match_low_quality=True,
                                    ignore_iof_thr=-1),
                      sampler=dict(type="RandomSampler", num=256,
                                   pos_fraction=0.5),
                      allowed_border=-1, pos_weight=-1),
             rpn_proposal=dict(nms_pre=200, max_per_img=64,
                               nms=dict(iou_threshold=0.7), min_bbox_size=0),
             rcnn=rcnn_stages),
        dict(rpn=dict(nms_pre=200, max_per_img=64,
                      nms=dict(iou_threshold=0.7), min_bbox_size=0),
             rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                       max_per_img=20)))
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    batch = _demo_batch()
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"],
                            rngs={"sampler": jax.random.PRNGKey(3)})
    assert {"loss_s0_cls", "loss_s1_cls", "loss_s2_cls",
            "loss_rpn_cls"} <= set(losses)
    assert all(np.isfinite(float(v)) for v in losses.values())
    dets, _ = model.apply(variables, img, jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 20, 5)


def test_yolov3():
    model = build_detector(
        dict(type="YOLOV3",
             backbone=dict(type="Darknet", depth=53, out_indices=(3, 4, 5)),
             neck=dict(type="YOLOV3Neck", in_channels=[1024, 512, 256],
                       out_channels=[64, 32, 16]),
             bbox_head=dict(type="YOLOV3Head", num_classes=2,
                            in_channels=[64, 32, 16],
                            out_channels=[128, 64, 32],
                            strides=[32, 16, 8])),
        None,
        dict(nms_pre=200, score_thr=0.05,
             nms=dict(type="nms", iou_threshold=0.45), max_per_img=30))
    rng = np.random.RandomState(1)
    bb = rng.rand(2, 5, 4).astype(np.float32) * 60
    bb[..., 2:] = bb[..., :2] + 12 + rng.rand(2, 5, 2).astype(np.float32) * 40
    batch = dict(gt_bboxes=jnp.asarray(bb),
                 gt_labels=jnp.asarray(rng.randint(0, 2, (2, 5)), jnp.int32),
                 gt_valid=jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 0, 0, 0]],
                                      bool),
                 img_shape=jnp.asarray([[128, 128], [120, 124]], jnp.int32))
    img = jnp.asarray(rng.rand(2, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert all(np.isfinite(float(v)) for v in losses.values())
    # best-anchor assignment: exactly one positive per valid gt
    assert float(losses["num_pos"]) == 5.0
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[128, 128], [120, 124]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 30, 5)


def test_ssd():
    model = build_detector(
        dict(type="SSD",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=1, num_outs=3),
             bbox_head=dict(type="SSDHead", num_classes=2, in_channels=16,
                            anchor_generator=dict(
                                type="SSDAnchorGenerator",
                                strides=[8, 16, 32],
                                ratios=[[2], [2, 3], [2]],
                                min_sizes=[16, 32, 64],
                                max_sizes=[32, 64, 128]),
                            bbox_coder=dict(
                                target_means=[0, 0, 0, 0],
                                target_stds=[0.1, 0.1, 0.2, 0.2]),
                            loss_bbox=dict(type="SmoothL1Loss", beta=1.0,
                                           loss_weight=1.0))),
        dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                           neg_iou_thr=0.5, min_pos_iou=0.0,
                           ignore_iof_thr=-1, gt_max_assign_all=False),
             allowed_border=-1, pos_weight=-1),
        dict(nms_pre=200, score_thr=0.02,
             nms=dict(type="nms", iou_threshold=0.45), max_per_img=30))
    rng = np.random.RandomState(1)
    bb = rng.rand(2, 5, 4).astype(np.float32) * 40
    bb[..., 2:] = bb[..., :2] + 16 + rng.rand(2, 5, 2).astype(np.float32) * 30
    batch = dict(gt_bboxes=jnp.asarray(bb),
                 gt_labels=jnp.asarray(rng.randint(0, 2, (2, 5)), jnp.int32),
                 gt_valid=jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 0, 0, 0]],
                                      bool),
                 img_shape=jnp.asarray([[128, 128], [120, 124]], jnp.int32))
    img = jnp.asarray(rng.rand(2, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert float(losses["num_pos"]) > 0
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[128, 128], [120, 124]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 30, 5)


def test_centernet():
    from pointtinybenchmark_tpu.models import CenterNetHead
    # gaussian targets: center pixel exactly 1, wh/offset recorded
    head = CenterNetHead(num_classes=2, in_channels=16, stride=4)
    bb = jnp.asarray([[8.0, 8.0, 24.0, 24.0]])
    hm, wh_t, off_t, mask = head._targets((16, 16), bb,
                                          jnp.asarray([1]),
                                          jnp.asarray([True]))
    assert float(hm.max()) == 1.0
    assert float(hm[:, :, 0].max()) < 1.0  # class 0 channel has no center
    assert float(mask.sum()) == 1.0
    cy, cx = 4, 4  # center (16,16)/4
    np.testing.assert_allclose(np.asarray(wh_t)[cy, cx], [4.0, 4.0])

    model = build_detector(
        dict(type="CenterNet",
             backbone=dict(type="ResNet", depth=18, base_channels=8,
                           out_indices=(3,)),
             neck=dict(type="CTResNetNeck", in_channels=64,
                       num_deconv_filters=[32, 16, 16]),
             bbox_head=dict(type="CenterNetHead", num_classes=2,
                            in_channels=16, feat_channels=16, stride=4)),
        None, dict(topk=20, score_thr=0.05))
    rng = np.random.RandomState(1)
    bb = rng.rand(2, 5, 4).astype(np.float32) * 30
    bb[..., 2:] = bb[..., :2] + 8 + rng.rand(2, 5, 2).astype(np.float32) * 20
    batch = dict(gt_bboxes=jnp.asarray(bb),
                 gt_labels=jnp.asarray(rng.randint(0, 2, (2, 5)), jnp.int32),
                 gt_valid=jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 0, 0, 0]],
                                      bool),
                 img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32))
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert float(losses["num_pos"]) == 5.0
    dets, _ = model.apply(variables, img, jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 20, 5)


def _mini_batch(rng, num_classes=2):
    bb = rng.rand(2, 4, 4).astype(np.float32) * 20
    bb[..., 2:] = bb[..., :2] + 10 + rng.rand(2, 4, 2).astype(np.float32) * 25
    return dict(gt_bboxes=jnp.asarray(bb),
                gt_labels=jnp.asarray(rng.randint(0, num_classes, (2, 4)),
                                      jnp.int32),
                gt_valid=jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], bool),
                img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32))


def test_foveabox():
    model = build_detector(dict(
        type="FoveaBox",
        backbone=dict(type="ResNet", depth=18, base_channels=8),
        neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
                  start_level=0, add_extra_convs="on_input", num_outs=5),
        bbox_head=dict(type="FoveaHead", num_classes=2, in_channels=16,
                       feat_channels=16, stacked_convs=1,
                       strides=[4, 8, 16, 32, 64],
                       base_edge_list=[8, 16, 32, 64, 128],
                       scale_ranges=((1, 32), (16, 64), (32, 128),
                                     (64, 256), (128, 512)))),
        None, dict(nms_pre=100, score_thr=0.01,
                   nms=dict(iou_threshold=0.5), max_per_img=20))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    batch = _mini_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert float(losses["num_pos"]) > 0
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 20, 5)


def test_vfnet():
    model = build_detector(dict(
        type="VFNet",
        backbone=dict(type="ResNet", depth=18, base_channels=8),
        neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
                  start_level=0, add_extra_convs="on_input", num_outs=5),
        bbox_head=dict(type="VFNetHead", num_classes=2, in_channels=16,
                       feat_channels=16, stacked_convs=1,
                       norm_cfg=dict(type="GN", num_groups=8),
                       strides=[4, 8, 16, 32, 64])),
        None, dict(nms_pre=100, score_thr=0.01,
                   nms=dict(iou_threshold=0.6), max_per_img=20))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    batch = _mini_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert float(losses["num_pos"]) > 0
    # refined bbox loss present: the star-DCN refine branch is wired in
    assert "loss_bbox_rf" in losses
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 20, 5)


def test_res2net_hrnet_backbones():
    from pointtinybenchmark_tpu.models import HRFPN, HRNet, Res2Net
    x = jnp.zeros((1, 64, 64, 3))
    r2 = Res2Net(depth=50, base_channels=8)
    v = r2.init(jax.random.PRNGKey(0), x)
    outs = r2.apply(v, x)
    assert [o.shape for o in outs] == [(1, 16, 16, 32), (1, 8, 8, 64),
                                       (1, 4, 4, 128), (1, 2, 2, 256)]
    extra = dict(
        stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                    num_blocks=(1,), num_channels=(8,)),
        stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                    num_blocks=(1, 1), num_channels=(8, 16)),
        stage3=dict(num_modules=1, num_branches=3, block="BASIC",
                    num_blocks=(1, 1, 1), num_channels=(8, 16, 32)),
        stage4=dict(num_modules=1, num_branches=4, block="BASIC",
                    num_blocks=(1, 1, 1, 1), num_channels=(8, 16, 32, 64)))
    hr = HRNet(extra=extra, base_channels=8)
    v = hr.init(jax.random.PRNGKey(0), x)
    outs = hr.apply(v, x)
    assert [o.shape for o in outs] == [(1, 16, 16, 8), (1, 8, 8, 16),
                                       (1, 4, 4, 32), (1, 2, 2, 64)]
    neck = HRFPN(in_channels=(8, 16, 32, 64), out_channels=16, num_outs=5)
    vn = neck.init(jax.random.PRNGKey(0), outs)
    fp = neck.apply(vn, outs)
    assert len(fp) == 5 and fp[0].shape == (1, 16, 16, 16)
    # end-to-end: HRNet+HRFPN under a RetinaHead builds & runs loss
    model = build_detector(dict(
        type="SingleStageDetector",
        backbone=dict(type="HRNet", extra=extra, base_channels=8),
        neck=dict(type="HRFPN", in_channels=[8, 16, 32, 64],
                  out_channels=16, num_outs=5),
        bbox_head=dict(type="RetinaHead", num_classes=1, in_channels=16,
                       feat_channels=16, stacked_convs=1,
                       anchor_generator=dict(type="AnchorGenerator",
                                             octave_base_scale=2,
                                             scales_per_octave=1,
                                             ratios=[1.0],
                                             strides=[4, 8, 16, 32, 64]),
                       bbox_coder=dict(target_means=[0, 0, 0, 0],
                                       target_stds=[1, 1, 1, 1]),
                       loss_cls=dict(type="FocalLoss", use_sigmoid=True),
                       loss_bbox=dict(type="L1Loss"))),
        dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                           neg_iou_thr=0.4, min_pos_iou=0,
                           ignore_iof_thr=-1),
             allowed_border=-1, pos_weight=-1),
        dict(nms_pre=100, score_thr=0.01, nms=dict(iou_threshold=0.5),
             max_per_img=20))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    batch = _mini_batch(rng, num_classes=1)
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert all(np.isfinite(float(v)) for v in losses.values())


def test_yolof():
    model = build_detector(dict(
        type="YOLOF",
        backbone=dict(type="ResNet", depth=18, base_channels=8,
                      out_indices=(3,)),
        neck=dict(type="DilatedEncoder", in_channels=64, out_channels=16,
                  block_mid_channels=8),
        bbox_head=dict(type="YOLOFHead", num_classes=2, in_channels=16,
                       num_cls_convs=1, num_reg_convs=2, stride=32)),
        None, dict(nms_pre=100, score_thr=0.01,
                   nms=dict(iou_threshold=0.6), max_per_img=20))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 128, 128, 3), jnp.float32)
    bb = rng.rand(2, 4, 4).astype(np.float32) * 40
    bb[..., 2:] = bb[..., :2] + 30 + rng.rand(2, 4, 2).astype(np.float32) * 50
    batch = dict(gt_bboxes=jnp.asarray(bb),
                 gt_labels=jnp.asarray(rng.randint(0, 2, (2, 4)), jnp.int32),
                 gt_valid=jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], bool),
                 img_shape=jnp.asarray([[128, 128], [120, 124]], jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert all(np.isfinite(float(v)) for v in losses.values())
    # uniform matching guarantees every valid gt gets >= 1 anchor: 5 gts,
    # match_times=4 on two cost matrices -> at least a handful of positives
    assert float(losses["num_pos"]) >= 5
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[128, 128], [120, 124]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 20, 5)


def test_ssd_vgg_backbone():
    from pointtinybenchmark_tpu.models import SSDVGG
    m = SSDVGG(input_size=300, base_channels=8)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 300, 300, 3),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    # the canonical SSD300 grid ladder
    assert [tuple(o.shape[1:3]) for o in outs] == [
        (38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    # conv4_3 is L2-normalized then rescaled: per-pixel channel norm == 20
    n = np.sqrt((np.asarray(outs[0], np.float64) ** 2).sum(-1))
    np.testing.assert_allclose(n, 20.0, rtol=1e-3)


def test_paa_gmm_split_and_training():
    from pointtinybenchmark_tpu.models.dense_heads.paa_head import gmm_split
    # clearly bimodal candidate losses: low cluster -> positive
    loss = jnp.asarray([[0.1, 0.12, 0.11, 2.0, 2.1, 1.9, 0.0, 0.0]])
    cand = jnp.asarray([[1, 1, 1, 1, 1, 1, 0, 0]], bool)
    pos = np.asarray(gmm_split(loss, cand))
    assert pos[0, :3].all() and not pos[0, 3:].any()

    model = build_detector(dict(
        type="SingleStageDetector",
        backbone=dict(type="ResNet", depth=18, base_channels=8),
        neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
                  start_level=0, add_extra_convs="on_input", num_outs=5),
        bbox_head=dict(type="PAAHead", num_classes=2, in_channels=16,
                       feat_channels=16, stacked_convs=1,
                       norm_cfg=dict(type="GN", num_groups=8),
                       anchor_generator=dict(type="AnchorGenerator",
                                             octave_base_scale=4,
                                             scales_per_octave=1,
                                             ratios=[1.0],
                                             strides=[4, 8, 16, 32, 64]),
                       bbox_coder=dict(target_means=[0, 0, 0, 0],
                                       target_stds=[0.1, 0.1, 0.2, 0.2]))),
        dict(assigner=dict(topk=9)),
        dict(nms_pre=100, score_thr=0.01, nms=dict(iou_threshold=0.6),
             max_per_img=20))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    batch = _mini_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert float(losses["num_pos"]) > 0
    assert "loss_iou" in losses
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 20, 5)


def test_autoassign():
    model = build_detector(dict(
        type="AutoAssign",
        backbone=dict(type="ResNet", depth=18, base_channels=8),
        neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
                  start_level=0, add_extra_convs="on_input", num_outs=5),
        bbox_head=dict(type="AutoAssignHead", num_classes=2, in_channels=16,
                       feat_channels=16, stacked_convs=1,
                       norm_cfg=dict(type="GN", num_groups=8),
                       strides=[4, 8, 16, 32, 64])),
        None, dict(nms_pre=100, score_thr=0.01,
                   nms=dict(iou_threshold=0.6), max_per_img=20))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    batch = _mini_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), img)
    # the center prior is a learnable parameter
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = [jax.tree_util.keystr(k) for k, _ in flat]
    assert any("center_prior_mean" in s for s in names)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert {"loss_pos", "loss_neg", "loss_center"} <= set(losses)

    # gradient reaches the center prior (differentiable assignment)
    def total(params):
        ls, _ = model.apply({**variables, "params": params}, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
        return sum(v for k, v in ls.items() if k.startswith("loss"))
    grads = jax.grad(total)(variables["params"])
    gmag = [float(np.abs(np.asarray(v)).sum())
            for k, v in jax.tree_util.tree_leaves_with_path(grads)
            if "center_prior" in jax.tree_util.keystr(k)]
    assert any(g > 0 for g in gmag)
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 20, 5)


def test_bfp_channel_mapper_necks():
    from pointtinybenchmark_tpu.models import BFP, ChannelMapper
    feats = tuple(jnp.ones((1, s, s, 8)) for s in (32, 16, 8, 4, 2))
    m = BFP(in_channels=8, num_levels=5, refine_level=2)
    v = m.init(jax.random.PRNGKey(0), feats)
    o = m.apply(v, feats)
    assert [x.shape for x in o] == [f.shape for f in feats]
    # balanced semantics: constant input stays constant after refinement add
    cm = ChannelMapper(in_channels=(8, 8, 8), out_channels=16,
                       kernel_size=3, num_outs=4)
    v = cm.init(jax.random.PRNGKey(0), feats[:3])
    o = cm.apply(v, feats[:3])
    assert len(o) == 4 and o[0].shape[-1] == 16 and o[3].shape[1] == 4


def test_regnet_backbone():
    from pointtinybenchmark_tpu.models import RegNet
    from pointtinybenchmark_tpu.models.backbones.regnet import (
        _adjust, generate_regnet)
    # published regnetx_400mf: stage widths [32,64,160,384] depths [1,2,7,12]
    w, d = generate_regnet(24, 24.48, 2.54, 22)
    ww, _ = _adjust(w, 16)
    assert ww == [32, 64, 160, 384] and d == [1, 2, 7, 12]
    m = RegNet(arch=dict(w0=24, wa=24.48, wm=2.54, depth=8, group_w=8),
               stem_channels=8)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    # depth-8 micro arch quantizes to 3 stages, strides 4/8/16 off the stem
    assert [o.shape[1] for o in outs] == [16, 8, 4]


def test_sparse_rcnn():
    model = build_detector(dict(
        type="SparseRCNN",
        backbone=dict(type="ResNet", depth=18, base_channels=8),
        neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
                  start_level=0, num_outs=4),
        num_proposals=16, num_stages=2, embed_dims=16, ffn_dim=32,
        num_classes=2, featmap_strides=[4, 8, 16, 32]),
        None, dict(max_per_img=10, score_thr=0.0))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    batch = _mini_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), img)
    # learnable proposals live in the param tree
    assert "init_proposal_boxes" in variables["params"]
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert float(losses["num_pos"]) == 5.0     # one-to-one set matching
    assert "loss_s0.cls" in losses             # per-stage losses
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 10, 5)


def test_cornernet():
    from pointtinybenchmark_tpu.models import corner_pool
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    # 'top' pool: each pixel sees the max of everything below it
    assert float(corner_pool(x, "top")[0, 0, 0, 0]) == 12.0
    assert float(corner_pool(x, "left")[0, 0, 0, 0]) == 3.0
    assert float(corner_pool(x, "bottom")[0, 3, 0, 0]) == 12.0
    assert float(corner_pool(x, "right")[0, 0, 3, 0]) == 3.0

    model = build_detector(dict(
        type="CornerNet",
        backbone=dict(type="HourglassNet", downsample_times=3, num_stacks=2,
                      stage_channels=(8, 8, 12, 16),
                      stage_blocks=(1, 1, 1, 1), feat_channel=8),
        bbox_head=dict(type="CornerHead", num_classes=2, in_channels=8,
                       feat_channels=8, stride=4)),
        None, dict(corner_topk=16, max_per_img=10, score_thr=0.05,
                   distance_threshold=0.5))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    bb = rng.rand(2, 4, 4).astype(np.float32) * 20
    bb[..., 2:] = bb[..., :2] + 12 + rng.rand(2, 4, 2).astype(np.float32) * 25
    batch = dict(gt_bboxes=jnp.asarray(bb),
                 gt_labels=jnp.asarray(rng.randint(0, 2, (2, 4)), jnp.int32),
                 gt_valid=jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], bool),
                 img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert {"loss_heatmap", "loss_pull", "loss_push",
            "loss_offset"} <= set(losses)
    assert float(losses["num_pos"]) == 5.0
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 10, 5)


def test_hourglass_backbone():
    from pointtinybenchmark_tpu.models import HourglassNet
    m = HourglassNet(downsample_times=3, num_stacks=2,
                     stage_channels=(8, 8, 12, 16),
                     stage_blocks=(1, 1, 1, 1), feat_channel=8)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    # stride-4 feature from every stack (intermediate supervision)
    assert len(outs) == 2 and all(o.shape == (1, 16, 16, 8) for o in outs)


def test_fsaf():
    model = build_detector(dict(
        type="FSAF",
        backbone=dict(type="ResNet", depth=18, base_channels=8),
        neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
                  start_level=0, add_extra_convs="on_input", num_outs=5),
        bbox_head=dict(type="FSAFHead", num_classes=2, in_channels=16,
                       feat_channels=16, stacked_convs=1,
                       strides=[4, 8, 16, 32, 64])),
        None, dict(nms_pre=100, score_thr=0.01,
                   nms=dict(iou_threshold=0.5), max_per_img=20))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    batch = _mini_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert all(np.isfinite(float(v)) for v in losses.values())
    # online level selection assigns every valid gt somewhere
    assert float(losses["num_pos"]) >= 5
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 20, 5)


def test_trident_resnet():
    from pointtinybenchmark_tpu.models import TridentResNet
    m = TridentResNet(depth=50, base_channels=8, out_indices=(3,))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    # shared 3x3 kernel: exactly one conv2_kernel param per trident block
    flat = [jax.tree_util.keystr(k) for k, _ in
            jax.tree_util.tree_leaves_with_path(v["params"])]
    assert sum("conv2_kernel" in s for s in flat) == 3  # r50 C5 has 3 blocks
    # train: 3 branch outputs; test: single test_branch output
    outs = m.apply(v, x, train=True, mutable=["batch_stats"])[0]
    assert len(outs) == 3
    outs_t = m.apply(v, x, train=False)
    assert len(outs_t) == 1 and outs_t[0].shape == (1, 2, 2, 256)


def test_resnest_backbone():
    from pointtinybenchmark_tpu.models import ResNeSt
    m = ResNeSt(depth=50, base_channels=8)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    # same shape contract as ResNet-50
    assert [o.shape for o in outs] == [(1, 16, 16, 32), (1, 8, 8, 64),
                                       (1, 4, 4, 128), (1, 2, 2, 256)]
    # split-attention gates sum to 1 across radix: rSoftMax property is
    # structural; just check grads flow through the attention fc params
    flat = [jax.tree_util.keystr(k) for k, _ in
            jax.tree_util.tree_leaves_with_path(v["params"])]
    assert any("splat" in s and "fc2" in s for s in flat)


def test_nasfpn_neck():
    from pointtinybenchmark_tpu.models import NASFPN
    feats = tuple(jnp.asarray(
        np.random.RandomState(0).rand(1, s, s, c), jnp.float32)
        for s, c in ((16, 16), (8, 32), (4, 64)))
    m = NASFPN(in_channels=(16, 32, 64), out_channels=8, num_outs=5,
               stack_times=2)
    v = m.init(jax.random.PRNGKey(0), feats)
    outs = m.apply(v, feats)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]
    assert all(o.shape[-1] == 8 for o in outs)
    # the discovered topology: 7 merge cells with out-convs per stage
    flat = [jax.tree_util.keystr(k) for k, _ in
            jax.tree_util.tree_leaves_with_path(v["params"])]
    assert any("s0_gp_64_4" in s for s in flat)
    assert any("s1_sum_77_7" in s for s in flat)
