"""Guided Anchoring (GA-Retina / GA-RPN) forward/backward/decode tests.

Reference surfaces: mmdet models/dense_heads/guided_anchor_head.py,
ga_retina_head.py, configs/guided_anchoring/ga_retinanet_r50_fpn_1x_coco.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.models import build_detector, build_head


def _demo_batch(b=2, g=5, num_classes=2, seed=1):
    rng = np.random.RandomState(seed)
    bb = rng.rand(b, g, 4).astype(np.float32) * 30
    bb[..., 2:] = bb[..., :2] + 6 + rng.rand(b, g, 2).astype(np.float32) * 20
    return dict(gt_bboxes=jnp.asarray(bb),
                gt_labels=jnp.asarray(rng.randint(0, num_classes, (b, g)),
                                      jnp.int32),
                gt_valid=jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 0, 0, 0]], bool),
                img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32))


def _ga_retina():
    return build_detector(
        dict(type="SingleStageDetector",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0,
                       add_extra_convs="on_input", num_outs=5),
             bbox_head=dict(
                 type="GARetinaHead", num_classes=2, in_channels=16,
                 feat_channels=16, stacked_convs=1, deform_groups=2,
                 approx_anchor_generator=dict(
                     type="AnchorGenerator", octave_base_scale=4,
                     scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                     strides=[4, 8, 16, 32, 64]),
                 square_anchor_generator=dict(
                     type="AnchorGenerator", ratios=[1.0], scales=[4],
                     strides=[4, 8, 16, 32, 64]),
                 loss_loc=dict(type="FocalLoss", use_sigmoid=True,
                               gamma=2.0, alpha=0.25, loss_weight=1.0),
                 loss_shape=dict(type="BoundedIoULoss", beta=0.2,
                                 loss_weight=1.0),
                 loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                               gamma=2.0, alpha=0.25, loss_weight=1.0),
                 loss_bbox=dict(type="SmoothL1Loss", beta=0.04,
                                loss_weight=1.0))),
        dict(ga_assigner=dict(type="ApproxMaxIoUAssigner", pos_iou_thr=0.5,
                              neg_iou_thr=0.4, min_pos_iou=0.4,
                              ignore_iof_thr=-1),
             ga_sampler=dict(type="RandomSampler", num=128, pos_fraction=0.5,
                             neg_pos_ub=-1),
             assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                           neg_iou_thr=0.5, min_pos_iou=0.0),
             center_ratio=0.2, ignore_ratio=0.5, allowed_border=-1,
             pos_weight=-1),
        dict(nms_pre=200, score_thr=0.05,
             nms=dict(type="nms", iou_threshold=0.5), max_per_img=50))


def test_ga_retina_forward_backward_decode():
    model = _ga_retina()
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    batch = _demo_batch()
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"],
                            rngs={"sampler": jax.random.PRNGKey(3)})
    for k in ("loss_cls", "loss_bbox", "loss_shape", "loss_loc"):
        assert np.isfinite(float(losses[k])), (k, float(losses[k]))
    assert float(losses["num_pos"]) > 0

    def total(v):
        l, _ = model.apply(v, img, batch, method=model.forward_train,
                           mutable=["batch_stats"],
                           rngs={"sampler": jax.random.PRNGKey(3)})
        return sum(x for k, x in l.items() if k.startswith("loss"))

    g = jax.grad(total)(variables)
    gn = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.abs(x).sum(), g["params"], 0.0))
    assert np.isfinite(gn) and gn > 0
    # the shape branch must receive gradient through BOTH the shape loss and
    # the adaption offsets
    shp_g = g["params"]["bbox_head_m"]["conv_shape"]["kernel"]
    assert float(jnp.abs(shp_g).sum()) > 0

    dets, _ = model.apply(variables, img, jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 50, 5)


def test_ga_loc_targets_center_vs_background():
    head = build_head(dict(
        type="GuidedAnchorHead", num_classes=1, in_channels=8,
        feat_channels=8,
        approx_anchor_generator=dict(octave_base_scale=4, scales_per_octave=3,
                                     ratios=[1.0], strides=[4, 8]),
        square_anchor_generator=dict(ratios=[1.0], scales=[4],
                                     strides=[4, 8]),
        train_cfg=dict(center_ratio=0.2, ignore_ratio=0.5)))
    # one 16x16 gt at (8..24): scale 16 = octave_base*stride0 -> level 0
    batch = dict(
        gt_bboxes=jnp.asarray([[[8., 8., 24., 24.]]]),
        gt_valid=jnp.asarray([[True]]))
    labels, weights, avg = head.ga_loc_targets(batch, [(16, 16), (8, 8)])
    labels = np.asarray(labels).reshape(-1)
    weights = np.asarray(weights).reshape(-1)
    lvl0 = labels[:256].reshape(16, 16)
    w0 = weights[:256].reshape(16, 16)
    # center cell (4, 4) on the stride-4 map is a positive (label 0)
    assert lvl0[4, 4] == 0 and w0[4, 4] == 1.0
    # far corner is background: label 1, weight 0.1
    assert lvl0[15, 15] == 1 and w0[15, 15] == pytest.approx(0.1)
    # ring between center and ignore region has weight 0
    assert (w0 == 0.0).any()
    # level 1 gets the neighbour-ignore paint around the projected gt
    w1 = weights[256:].reshape(8, 8)
    assert (w1[2, 2] == 0.0) and w1[7, 7] == pytest.approx(0.1)
    assert avg == pytest.approx((256 + 64) / 200.0)


def test_feature_adaption_shapes():
    from pointtinybenchmark_tpu.models import FeatureAdaption
    mod = FeatureAdaption(out_channels=16, deform_groups=4)
    x = jnp.ones((2, 8, 8, 16))
    shp = jnp.zeros((2, 8, 8, 2))
    params = mod.init(jax.random.PRNGKey(0), x, shp)
    out = mod.apply(params, x, shp)
    assert out.shape == (2, 8, 8, 16)
    assert bool(jnp.isfinite(out).all())


def _free_anchor():
    return build_detector(
        dict(type="SingleStageDetector",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0,
                       add_extra_convs="on_input", num_outs=5),
             bbox_head=dict(
                 type="FreeAnchorRetinaHead", num_classes=2, in_channels=16,
                 feat_channels=16, stacked_convs=1, pre_anchor_topk=8,
                 bbox_thr=0.6, gamma=2.0, alpha=0.5,
                 anchor_generator=dict(type="AnchorGenerator",
                                       octave_base_scale=2,
                                       scales_per_octave=3,
                                       ratios=[0.5, 1.0, 2.0],
                                       strides=[4, 8, 16, 32, 64]),
                 bbox_coder=dict(target_means=[0, 0, 0, 0],
                                 target_stds=[0.1, 0.1, 0.2, 0.2]),
                 loss_cls=dict(type="FocalLoss", use_sigmoid=True),
                 loss_bbox=dict(type="SmoothL1Loss", beta=0.11,
                                loss_weight=0.75))),
        dict(allowed_border=-1, pos_weight=-1),
        dict(nms_pre=200, score_thr=0.05,
             nms=dict(type="nms", iou_threshold=0.5), max_per_img=50))


def test_free_anchor_forward_backward_decode():
    model = _free_anchor()
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    batch = _demo_batch()
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert np.isfinite(float(losses["loss_positive_bag"]))
    assert np.isfinite(float(losses["loss_negative_bag"]))
    # 5 valid gts in the batch
    assert float(losses["num_pos"]) == 5.0

    def total(v):
        l, _ = model.apply(v, img, batch, method=model.forward_train,
                           mutable=["batch_stats"])
        return sum(x for k, x in l.items() if k.startswith("loss"))

    g = jax.grad(total)(variables)
    reg_g = g["params"]["bbox_head_m"]["retina_reg"]["kernel"]
    cls_g = g["params"]["bbox_head_m"]["retina_cls"]["kernel"]
    assert float(jnp.abs(reg_g).sum()) > 0 and float(jnp.abs(cls_g).sum()) > 0

    dets, _ = model.apply(variables, img, jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 50, 5)


def test_free_anchor_bag_loss_prefers_matching_anchor():
    """Positive bag loss decreases when the bag contains a confident,
    well-localized anchor (mean-max behavior)."""
    from pointtinybenchmark_tpu.models import FreeAnchorRetinaHead
    # mean-max of all-low probs vs one-high bag
    import jax.numpy as jnp
    def bag_loss(m_prob, alpha=0.5):
        w = 1.0 / jnp.clip(1.0 - m_prob, 1e-12, None)
        w = w / w.sum()
        return -alpha * jnp.log(jnp.clip((w * m_prob).sum(), 1e-12, 1.0))
    low = bag_loss(jnp.full((8,), 0.1))
    high = bag_loss(jnp.asarray([0.9] + [0.1] * 7))
    assert float(high) < float(low)


def _sabl_retina():
    return build_detector(
        dict(type="SingleStageDetector",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0,
                       add_extra_convs="on_input", num_outs=5),
             bbox_head=dict(
                 type="SABLRetinaHead", num_classes=2, in_channels=16,
                 feat_channels=16, stacked_convs=1,
                 approx_anchor_generator=dict(
                     type="AnchorGenerator", octave_base_scale=4,
                     scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                     strides=[4, 8, 16, 32, 64]),
                 square_anchor_generator=dict(
                     type="AnchorGenerator", ratios=[1.0], scales=[4],
                     strides=[4, 8, 16, 32, 64]),
                 bbox_coder_cfg=dict(num_buckets=14, scale_factor=3.0),
                 loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                               gamma=2.0, alpha=0.25, loss_weight=1.0),
                 loss_bbox_cls=dict(type="CrossEntropyLoss",
                                    use_sigmoid=True, loss_weight=1.5),
                 loss_bbox_reg=dict(type="SmoothL1Loss", beta=1.0 / 9.0,
                                    loss_weight=1.5))),
        dict(assigner=dict(type="ApproxMaxIoUAssigner", pos_iou_thr=0.5,
                           neg_iou_thr=0.4, min_pos_iou=0.0),
             allowed_border=-1, pos_weight=-1),
        dict(nms_pre=200, score_thr=0.05,
             nms=dict(type="nms", iou_threshold=0.5), max_per_img=50))


def test_sabl_retina_forward_backward_decode():
    model = _sabl_retina()
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    batch = _demo_batch()
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    for k in ("loss_cls", "loss_bbox_cls", "loss_bbox_reg"):
        assert np.isfinite(float(losses[k])), (k, float(losses[k]))
    assert float(losses["num_pos"]) > 0

    def total(v):
        l, _ = model.apply(v, img, batch, method=model.forward_train,
                           mutable=["batch_stats"])
        return sum(x for k, x in l.items() if k.startswith("loss"))

    g = jax.grad(total)(variables)
    for name in ("retina_bbox_cls", "retina_bbox_reg", "retina_cls"):
        gk = g["params"]["bbox_head_m"][name]["kernel"]
        assert float(jnp.abs(gk).sum()) > 0, name

    dets, _ = model.apply(variables, img, jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 50, 5)


def test_bucketing_coder_roundtrip():
    from pointtinybenchmark_tpu.core.bbox import bbox2bucket, bucket2bbox
    rng = np.random.RandomState(0)
    p = rng.rand(16, 4).astype(np.float32) * 40
    p[:, 2:] = p[:, :2] + 20 + rng.rand(16, 2).astype(np.float32) * 40
    # gts near the proposals (within the 3x rescaled region)
    g = p + rng.uniform(-4, 4, (16, 4)).astype(np.float32)
    g[:, 2:] = np.maximum(g[:, 2:], g[:, :2] + 2)
    offs, ow, bl, cw = bbox2bucket(jnp.asarray(p), jnp.asarray(g), 14, 3.0)
    # exact-prediction decode: logits peaked at label buckets, offsets exact
    cls = np.asarray(bl) * 30.0
    boxes, conf = bucket2bbox(jnp.asarray(p), jnp.asarray(cls),
                              jnp.asarray(offs), 14, 3.0)
    np.testing.assert_allclose(np.asarray(boxes), g, atol=1e-3)
    assert (np.asarray(conf) > 0.99).all()
    # top-1 bucket weight is always 1
    assert (np.asarray(ow).reshape(16, 4, 7).max(-1) == 1.0).all()


def test_ld_distillation():
    """LD: student GFL head distills teacher DFL distributions; loss_ld ~0
    when teacher == student outputs, > 0 otherwise."""
    head_cfg = dict(
        type="LDHead", num_classes=2, in_channels=16, feat_channels=16,
        stacked_convs=1, reg_max=8, norm_cfg=dict(type="GN", num_groups=4),
        anchor_generator=dict(type="AnchorGenerator", ratios=[1.0],
                              octave_base_scale=8, scales_per_octave=1,
                              strides=[4, 8, 16, 32, 64]),
        loss_cls=dict(type="QualityFocalLoss", use_sigmoid=True, beta=2.0),
        loss_dfl=dict(type="DistributionFocalLoss", loss_weight=0.25),
        loss_ld=dict(type="KnowledgeDistillationKLDivLoss",
                     loss_weight=0.25, T=10))
    teacher_cfg = dict(
        type="SingleStageDetector",
        backbone=dict(type="ResNet", depth=18, base_channels=8),
        neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
                  start_level=0, add_extra_convs="on_input", num_outs=5),
        bbox_head=dict(type="GFLHead", num_classes=2, in_channels=16,
                       feat_channels=16, stacked_convs=1, reg_max=8,
                       norm_cfg=dict(type="GN", num_groups=4),
                       anchor_generator=head_cfg["anchor_generator"]))
    model = build_detector(
        dict(type="KnowledgeDistillationSingleStageDetector",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0,
                       add_extra_convs="on_input", num_outs=5),
             bbox_head=head_cfg,
             teacher=teacher_cfg),
        dict(assigner=dict(type="ATSSAssigner", topk=9), allowed_border=-1),
        dict(nms_pre=100, score_thr=0.05,
             nms=dict(iou_threshold=0.6), max_per_img=20))
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    batch = _demo_batch()
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert "loss_ld" in losses and np.isfinite(float(losses["loss_ld"]))

    def total(v):
        l, _ = model.apply(v, img, batch, method=model.forward_train,
                           mutable=["batch_stats"])
        return l["loss_ld"]

    g = jax.grad(total)(variables)
    # gradient flows into the student reg conv but NOT into the teacher
    stu = g["params"]["bbox_head_m"]["gfl_reg"]["kernel"]
    tea = g["params"]["teacher_m"]["bbox_head_m"]["gfl_reg"]["kernel"]
    assert float(jnp.abs(stu).sum()) > 0
    assert float(jnp.abs(tea).sum()) == 0.0


def test_kd_kl_div_loss_zero_when_equal():
    from pointtinybenchmark_tpu.models.losses.advanced import (
        KnowledgeDistillationKLDivLoss)
    loss = KnowledgeDistillationKLDivLoss(T=10)
    logits = jnp.asarray(np.random.RandomState(0).randn(6, 9), jnp.float32)
    assert float(loss(logits, logits)) == pytest.approx(0.0, abs=1e-6)
    other = logits + jnp.asarray(np.random.RandomState(1).randn(6, 9),
                                 jnp.float32)
    assert float(loss(logits, other)) > 0


def test_segmented_rank():
    from pointtinybenchmark_tpu.models.losses.pisa_loss import segmented_rank
    gid = jnp.asarray([0, 0, 0, 1, 1, 2])
    score = jnp.asarray([0.5, 0.9, 0.1, 0.3, 0.7, 0.2])
    valid = jnp.ones((6,), bool)
    r = np.asarray(segmented_rank(gid, score, valid))
    assert list(r) == [1, 0, 2, 1, 0, 0]
    # invalid elements don't disturb group ranks
    valid2 = jnp.asarray([True, False, True, True, True, True])
    r2 = np.asarray(segmented_rank(gid, score, valid2))
    assert r2[0] == 0 and r2[2] == 1


def test_pisa_retina_forward_backward():
    model = build_detector(
        dict(type="SingleStageDetector",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0,
                       add_extra_convs="on_input", num_outs=5),
             bbox_head=dict(
                 type="PISARetinaHead", num_classes=2, in_channels=16,
                 feat_channels=16, stacked_convs=1,
                 anchor_generator=dict(type="AnchorGenerator",
                                       octave_base_scale=2,
                                       scales_per_octave=3,
                                       ratios=[0.5, 1.0, 2.0],
                                       strides=[4, 8, 16, 32, 64]),
                 bbox_coder=dict(target_means=[0, 0, 0, 0],
                                 target_stds=[1, 1, 1, 1]),
                 loss_cls=dict(type="FocalLoss", use_sigmoid=True),
                 loss_bbox=dict(type="SmoothL1Loss", beta=0.11))),
        dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                           neg_iou_thr=0.4, min_pos_iou=0.0),
             isr=dict(k=2.0, bias=0.0), carl=dict(k=1.0, bias=0.2),
             allowed_border=-1, pos_weight=-1),
        dict(nms_pre=200, score_thr=0.05,
             nms=dict(iou_threshold=0.5), max_per_img=50))
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    batch = _demo_batch()
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    for k in ("loss_cls", "loss_bbox", "loss_carl"):
        assert np.isfinite(float(losses[k])), (k, float(losses[k]))
    assert float(losses["num_pos"]) > 0

    def total(v):
        l, _ = model.apply(v, img, batch, method=model.forward_train,
                           mutable=["batch_stats"])
        return sum(x for k, x in l.items() if k.startswith("loss"))

    g = jax.grad(total)(variables)
    gn = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.abs(x).sum(), g["params"], 0.0))
    assert np.isfinite(gn) and gn > 0


def test_pisa_faster_rcnn_forward_backward():
    model = build_detector(
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
                 loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True),
                 loss_bbox=dict(type="L1Loss")),
             roi_head=dict(
                 type="PISARoIHead",
                 bbox_roi_extractor=dict(
                     roi_layer=dict(type="RoIAlign", output_size=7,
                                    sampling_ratio=0),
                     out_channels=16, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(
                     type="Shared2FCBBoxHead", num_classes=2, in_channels=16,
                     fc_out_channels=64, roi_feat_size=7,
                     bbox_coder=dict(target_means=[0, 0, 0, 0],
                                     target_stds=[0.1, 0.1, 0.2, 0.2]),
                     loss_cls=dict(type="CrossEntropyLoss"),
                     loss_bbox=dict(type="SmoothL1Loss", beta=1.0)))),
        dict(rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                    neg_iou_thr=0.3, min_pos_iou=0.3),
                      sampler=dict(type="RandomSampler", num=64,
                                   pos_fraction=0.5),
                      allowed_border=-1, pos_weight=-1),
             rpn_proposal=dict(nms_pre=100, max_per_img=50,
                               nms=dict(iou_threshold=0.7)),
             rcnn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                     neg_iou_thr=0.5, min_pos_iou=0.5,
                                     match_low_quality=False),
                       sampler=dict(type="RandomSampler", num=32,
                                    pos_fraction=0.25,
                                    add_gt_as_proposals=True),
                       isr=dict(k=2.0, bias=0.0),
                       carl=dict(k=1.0, bias=0.2), pos_weight=-1)),
        dict(rpn=dict(nms_pre=100, max_per_img=50,
                      nms=dict(iou_threshold=0.7)),
             rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                       max_per_img=20)))
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    batch = _demo_batch()
    variables = model.init(jax.random.PRNGKey(0), img)
    rngs = {"sampler": jax.random.PRNGKey(3)}
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"], rngs=rngs)
    for k in losses:
        if k.startswith("loss"):
            assert np.isfinite(float(losses[k])), (k, float(losses[k]))
    assert "loss_carl" in losses

    def total(v):
        l, _ = model.apply(v, img, batch, method=model.forward_train,
                           mutable=["batch_stats"], rngs=rngs)
        return sum(x for k, x in l.items() if k.startswith("loss"))

    g = jax.grad(total)(variables)
    gn = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.abs(x).sum(), g["params"], 0.0))
    assert np.isfinite(gn) and gn > 0
