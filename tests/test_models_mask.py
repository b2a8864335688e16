import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.models import build_detector
from pointtinybenchmark_tpu.models.roi_heads.mask_head import mask_target


def test_mask_target_crops_gt_bitmap():
    # gt mask: filled square [8..24)x[8..24) in a 32x32 image
    gm = np.zeros((1, 2, 32, 32), np.float32)
    gm[0, 0, 8:24, 8:24] = 1
    rois = jnp.asarray([[0, 8, 8, 24, 24]], jnp.float32)  # exactly the square
    t = np.asarray(mask_target(jnp.asarray(gm), rois,
                               jnp.asarray([0]), mask_size=14))
    assert t.shape == (1, 14, 14)
    assert t.mean() > 0.9  # nearly all inside
    # roi fully outside the mask
    rois2 = jnp.asarray([[0, 0, 0, 6, 6]], jnp.float32)
    t2 = np.asarray(mask_target(jnp.asarray(gm), rois2,
                                jnp.asarray([0]), mask_size=14))
    assert t2.mean() < 0.1


def test_mask_pipeline_rasterize():
    from pointtinybenchmark_tpu.data.transforms import LoadAnnotations
    segs = [[[2.0, 2.0, 10.0, 2.0, 10.0, 10.0, 2.0, 10.0]], None]
    masks = LoadAnnotations._rasterize(segs, 16, 16)
    assert masks.shape == (2, 16, 16)
    assert masks[0].sum() > 40  # ~8x8 square
    assert masks[1].sum() == 0


@pytest.mark.slow
def test_maskrcnn_forward_backward():
    model = build_detector(
        dict(type="MaskRCNN",
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
             roi_head=dict(
                 type="StandardRoIHead",
                 bbox_roi_extractor=dict(
                     roi_layer=dict(type="RoIAlign", output_size=7,
                                    sampling_ratio=0),
                     out_channels=16, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(type="Shared2FCBBoxHead", num_classes=2,
                                in_channels=16, fc_out_channels=32,
                                roi_feat_size=7,
                                bbox_coder=dict(
                                    target_means=[0, 0, 0, 0],
                                    target_stds=[0.1, 0.1, 0.2, 0.2]),
                                loss_cls=dict(type="CrossEntropyLoss",
                                              loss_weight=1.0),
                                loss_bbox=dict(type="L1Loss",
                                               loss_weight=1.0)),
                 mask_head=dict(type="FCNMaskHead", num_convs=2,
                                in_channels=16, conv_out_channels=16,
                                num_classes=2))),
        dict(rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                    neg_iou_thr=0.3, min_pos_iou=0.3,
                                    match_low_quality=True,
                                    ignore_iof_thr=-1),
                      sampler=dict(type="RandomSampler", num=256,
                                   pos_fraction=0.5),
                      allowed_border=-1, pos_weight=-1),
             rpn_proposal=dict(nms_pre=200, max_per_img=64,
                               nms=dict(iou_threshold=0.7), min_bbox_size=0),
             rcnn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                     neg_iou_thr=0.5, min_pos_iou=0.5,
                                     match_low_quality=False,
                                     ignore_iof_thr=-1),
                       sampler=dict(type="RandomSampler", num=32,
                                    pos_fraction=0.25,
                                    add_gt_as_proposals=True),
                       pos_weight=-1)),
        dict(rpn=dict(nms_pre=200, max_per_img=64,
                      nms=dict(iou_threshold=0.7), min_bbox_size=0),
             rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                       max_per_img=10)))
    rng = np.random.RandomState(1)
    bb = rng.rand(2, 5, 4).astype(np.float32) * 30
    bb[..., 2:] = bb[..., :2] + 8 + rng.rand(2, 5, 2).astype(np.float32) * 20
    masks = np.zeros((2, 5, 64, 64), np.uint8)
    for b_ in range(2):
        for g_ in range(5):
            x1, y1, x2, y2 = bb[b_, g_].astype(int)
            masks[b_, g_, y1:y2, x1:x2] = 1
    batch = dict(gt_bboxes=jnp.asarray(bb),
                 gt_labels=jnp.asarray(rng.randint(0, 2, (2, 5)), jnp.int32),
                 gt_valid=jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 0, 0, 0]],
                                      bool),
                 gt_masks=jnp.asarray(masks),
                 img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32))
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"],
                            rngs={"sampler": jax.random.PRNGKey(3)})
    assert "loss_mask" in losses
    assert all(np.isfinite(float(v)) for v in losses.values())
    (dets, seg), _ = model.apply(variables, img,
                                 jnp.asarray([[64, 64], [60, 62]]),
                                 method=model.simple_test)
    assert seg.shape == (2, 10, 14, 14)
    assert float(jnp.min(seg)) >= 0 and float(jnp.max(seg)) <= 1


def test_yolact():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pointtinybenchmark_tpu.models import build_detector
    model = build_detector(dict(
        type="YOLACT",
        backbone=dict(type="ResNet", depth=18, base_channels=8),
        neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
                  start_level=1, add_extra_convs="on_input", num_outs=3),
        num_classes=2, num_protos=8, feat_channels=16, mask_pos_budget=16,
        strides=[8, 16, 32],
        anchor_generator=dict(octave_base_scale=3, scales_per_octave=1,
                              ratios=[0.5, 1.0, 2.0], strides=[8, 16, 32])),
        None, dict(nms_pre=200, score_thr=0.02,
                   nms=dict(iou_threshold=0.5), max_per_img=20))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    bb = rng.rand(2, 4, 4).astype(np.float32) * 20
    bb[..., 2:] = bb[..., :2] + 16 + rng.rand(2, 4, 2).astype(np.float32) * 25
    batch = dict(gt_bboxes=jnp.asarray(bb),
                 gt_labels=jnp.asarray(rng.randint(0, 2, (2, 4)), jnp.int32),
                 gt_valid=jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], bool),
                 img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"],
                            rngs={"sampler": jax.random.PRNGKey(1)})
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert {"loss_cls", "loss_bbox", "loss_mask",
            "loss_semantic"} <= set(losses)
    assert float(losses["num_pos"]) > 0
    dets, protos = model.apply(variables, img,
                               jnp.asarray([[64, 64], [60, 62]]),
                               method=model.simple_test)
    assert dets.bboxes.shape == (2, 20, 5)
    # protonet emits k prototype masks at 1/4 input resolution
    assert protos.shape == (2, 16, 16, 8)


def test_mask_scoring_rcnn_forward_backward():
    """MS R-CNN: MaskIoU head regresses predicted-vs-gt mask IoU."""
    model = build_detector(
        dict(type="MaskRCNN",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0, num_outs=5),
             rpn_head=dict(type="RPNHead", num_classes=1, in_channels=16,
                           feat_channels=16,
                           anchor_generator=dict(type="AnchorGenerator",
                                                 scales=[2],
                                                 ratios=[0.5, 1.0, 2.0],
                                                 strides=[4, 8, 16, 32, 64]),
                           loss_cls=dict(type="CrossEntropyLoss",
                                         use_sigmoid=True),
                           loss_bbox=dict(type="L1Loss")),
             roi_head=dict(
                 type="MaskScoringRoIHead",
                 mask_iou_head=dict(num_convs=2, conv_out_channels=16,
                                    fc_out_channels=32),
                 bbox_roi_extractor=dict(
                     roi_layer=dict(type="RoIAlign", output_size=7,
                                    sampling_ratio=0),
                     out_channels=16, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(type="Shared2FCBBoxHead", num_classes=2,
                                in_channels=16, fc_out_channels=32,
                                roi_feat_size=7,
                                bbox_coder=dict(
                                    target_stds=[0.1, 0.1, 0.2, 0.2]),
                                loss_cls=dict(type="CrossEntropyLoss"),
                                loss_bbox=dict(type="L1Loss")),
                 mask_head=dict(type="FCNMaskHead", num_convs=2,
                                in_channels=16, conv_out_channels=16,
                                num_classes=2))),
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
                       mask_thr_binary=0.5, pos_weight=-1)),
        dict(rpn=dict(nms_pre=100, max_per_img=50,
                      nms=dict(iou_threshold=0.7)),
             rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                       max_per_img=10)))
    rng = np.random.RandomState(1)
    bb = rng.rand(2, 5, 4).astype(np.float32) * 30
    bb[..., 2:] = bb[..., :2] + 8 + rng.rand(2, 5, 2).astype(np.float32) * 20
    masks = np.zeros((2, 5, 64, 64), np.uint8)
    for b_ in range(2):
        for g_ in range(5):
            x1, y1, x2, y2 = bb[b_, g_].astype(int)
            masks[b_, g_, y1:y2, x1:x2] = 1
    batch = dict(gt_bboxes=jnp.asarray(bb),
                 gt_labels=jnp.asarray(rng.randint(0, 2, (2, 5)), jnp.int32),
                 gt_valid=jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 0, 0, 0]],
                                      bool),
                 gt_masks=jnp.asarray(masks),
                 img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32))
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    rngs = {"sampler": jax.random.PRNGKey(3)}
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"], rngs=rngs)
    assert "loss_mask_iou" in losses
    assert all(np.isfinite(float(v)) for v in losses.values())

    def total(v):
        l, _ = model.apply(v, img, batch, method=model.forward_train,
                           mutable=["batch_stats"], rngs=rngs)
        return sum(x for k, x in l.items() if k.startswith("loss"))

    g = jax.grad(total)(variables)
    giou = g["params"]["roi_head_m"]["mask_iou_head_m"]["fc_mask_iou"]["kernel"]
    assert float(jnp.abs(giou).sum()) > 0


def test_mask_roi_extractor_resolution():
    """The mask branch must honor mask_roi_extractor (mmdet MaskRCNN:
    RoIAlign output_size=14 -> 28x28 mask crops after the deconv), not the
    bbox extractor's 7x7 (mmdet configs/_base_/models/mask_rcnn_r50_fpn.py)."""
    from pointtinybenchmark_tpu.models.roi_heads.standard_roi_head import \
        StandardRoIHead
    head = StandardRoIHead(
        bbox_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=7, sampling_ratio=0),
            out_channels=8, featmap_strides=[4, 8, 16, 32]),
        bbox_head=dict(type="Shared2FCBBoxHead", num_classes=2,
                       in_channels=8, fc_out_channels=16, roi_feat_size=7,
                       loss_cls=dict(type="CrossEntropyLoss"),
                       loss_bbox=dict(type="L1Loss")),
        mask_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=14,
                           sampling_ratio=0),
            out_channels=8, featmap_strides=[4, 8, 16, 32]),
        mask_head=dict(type="FCNMaskHead", num_convs=1, in_channels=8,
                       conv_out_channels=8, num_classes=2),
        test_cfg=dict(score_thr=0.0, nms=dict(iou_threshold=0.5),
                      max_per_img=4))
    ec = head._mask_extractor_cfg
    assert ec["output_size"] == 14
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.rand(1, 64 // s, 64 // s, 8), jnp.float32)
             for s in (4, 8, 16, 32)]
    props = jnp.asarray([[[4.0, 4.0, 28.0, 28.0], [10.0, 8.0, 40.0, 44.0]]])
    valid = jnp.ones((1, 2), bool)
    shapes = jnp.asarray([[64, 64]], jnp.int32)
    variables = head.init(jax.random.PRNGKey(0), feats, props, valid,
                          shapes, method=head.simple_test)
    dets, crops = head.apply(variables, feats, props, valid, shapes,
                             method=head.simple_test)
    assert crops.shape == (1, 4, 28, 28)
