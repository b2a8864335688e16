"""TridentNet — 3-branch train / single-branch test Faster R-CNN."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.models import build_detector


@pytest.mark.slow
def test_trident_faster_rcnn():
    model = build_detector(
        dict(type="TridentFasterRCNN",
             backbone=dict(type="TridentResNet", depth=50, base_channels=8,
                           out_indices=(3,)),
             rpn_head=dict(type="RPNHead", num_classes=1, in_channels=256,
                           feat_channels=32,
                           anchor_generator=dict(type="AnchorGenerator",
                                                 scales=[2],
                                                 ratios=[0.5, 1.0, 2.0],
                                                 strides=[16]),
                           bbox_coder=dict(target_means=[0, 0, 0, 0],
                                           target_stds=[1, 1, 1, 1]),
                           loss_cls=dict(type="CrossEntropyLoss",
                                         use_sigmoid=True),
                           loss_bbox=dict(type="L1Loss")),
             roi_head=dict(
                 type="StandardRoIHead",
                 bbox_roi_extractor=dict(
                     roi_layer=dict(type="RoIAlign", output_size=7,
                                    sampling_ratio=0),
                     out_channels=256, featmap_strides=[16]),
                 bbox_head=dict(type="Shared2FCBBoxHead", num_classes=2,
                                in_channels=256, fc_out_channels=32,
                                roi_feat_size=7))),
        dict(rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                    neg_iou_thr=0.3, min_pos_iou=0.3,
                                    match_low_quality=True),
                      sampler=dict(type="RandomSampler", num=64,
                                   pos_fraction=0.5)),
             rpn_proposal=dict(nms_pre=100, max_per_img=32,
                               nms=dict(iou_threshold=0.7), min_bbox_size=0),
             rcnn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                     neg_iou_thr=0.5, min_pos_iou=0.5),
                       sampler=dict(type="RandomSampler", num=32,
                                    pos_fraction=0.25))),
        dict(rpn=dict(nms_pre=100, max_per_img=32,
                      nms=dict(iou_threshold=0.7), min_bbox_size=0),
             rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                       max_per_img=8)))
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
                            mutable=["batch_stats"],
                            rngs={"sampler": jax.random.PRNGKey(3)})
    assert all(np.isfinite(float(v)) for v in losses.values()), losses
    # 3 branches x (B=2): the RoI stage saw a tripled batch
    assert "loss_cls" in losses and "loss_rpn_cls" in losses
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 8, 5)
