"""Cascade RPN (region assignment, two-stage refinement) and the
standalone RPN detector."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.models import build_detector, region_assign


def test_region_assign_level_and_center():
    # anchors on 2 levels: strides 4 and 8 over a 32x32 image
    centers, lvl_ids = [], []
    for lvl, s in enumerate((4, 8)):
        n = 32 // s
        ys, xs = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        c = np.stack([(xs + 0.5) * s, (ys + 0.5) * s], -1).reshape(-1, 2)
        centers.append(c)
        lvl_ids.append(np.full(len(c), lvl, np.int32))
    centers = jnp.asarray(np.concatenate(centers), jnp.float32)
    lvl_ids = np.concatenate(lvl_ids)
    # gt ~ 16x16 at (8..24): scale 16 -> level 0 (16/4/4 = 1 -> floor(log2)=0)
    gt = jnp.asarray([[8.0, 8.0, 24.0, 24.0]])
    gv = jnp.asarray([True])
    assigned, pos, validneg = region_assign(centers, lvl_ids, (4, 8), gt, gv,
                                            anchor_scale=4.0)
    pos = np.asarray(pos)
    a = np.asarray(assigned)
    c = np.asarray(centers)
    # positives only on level 0, centers within the 0.2-ratio center region
    assert pos.sum() > 0
    assert all(lvl_ids[i] == 0 for i in np.where(pos)[0])
    # half-extent = max(0.2 * 16 / 2, stride / 2) = 2.0
    for i in np.where(pos)[0]:
        assert abs(c[i, 0] - 16) <= 2.0 and abs(c[i, 1] - 16) <= 2.0
    # ignore ring exists (assigned == -1 somewhere near the gt)
    assert (a == -1).sum() > 0
    # invalid gt -> nothing assigned
    a2, p2, _ = region_assign(centers, lvl_ids, (4, 8), gt,
                              jnp.asarray([False]))
    assert np.asarray(p2).sum() == 0


@pytest.mark.slow
def test_cascade_rpn_faster_rcnn():
    model = build_detector(
        dict(type="FasterRCNN",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0, num_outs=4),
             rpn_head=dict(type="CascadeRPNHead", in_channels=16,
                           feat_channels=16, strides=[4, 8, 16, 32],
                           anchor_scale=4.0),
             roi_head=dict(
                 type="StandardRoIHead",
                 bbox_roi_extractor=dict(
                     roi_layer=dict(type="RoIAlign", output_size=7,
                                    sampling_ratio=0),
                     out_channels=16, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(type="Shared2FCBBoxHead", num_classes=2,
                                in_channels=16, fc_out_channels=32,
                                roi_feat_size=7))),
        dict(rpn=[dict(assigner=dict(center_ratio=0.2, ignore_ratio=0.5),
                       target_stds=(0.1, 0.1, 0.5, 0.5), loss_weight=10.0),
                  dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3),
                       target_stds=(0.05, 0.05, 0.1, 0.1),
                       loss_weight=10.0)],
             rpn_proposal=dict(nms_pre=100, max_per_img=32,
                               nms=dict(iou_threshold=0.7)),
             rcnn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                     neg_iou_thr=0.5, min_pos_iou=0.5),
                       sampler=dict(type="RandomSampler", num=32,
                                    pos_fraction=0.25))),
        dict(rpn=dict(nms_pre=100, max_per_img=32,
                      nms=dict(iou_threshold=0.7)),
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

    def loss_fn(v):
        losses, _ = model.apply(v, img, batch, method=model.forward_train,
                                mutable=["batch_stats"],
                                rngs={"sampler": jax.random.PRNGKey(3)})
        return sum(jnp.sum(x) for k, x in losses.items()
                   if k.startswith("loss")), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables)
    assert np.isfinite(float(total)), losses
    assert "loss_rpn_s1_reg" in losses and "loss_rpn_s2_reg" in losses
    gn = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.asarray(x, jnp.float32) ** 2)),
        grads["params"], 0.0)
    assert np.isfinite(gn) and gn > 0
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 8, 5)


def test_rpn_detector_standalone():
    model = build_detector(
        dict(type="RPN",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0, num_outs=4),
             rpn_head=dict(type="RPNHead", num_classes=1, in_channels=16,
                           feat_channels=16,
                           anchor_generator=dict(type="AnchorGenerator",
                                                 scales=[2],
                                                 ratios=[0.5, 1.0, 2.0],
                                                 strides=[4, 8, 16, 32]),
                           bbox_coder=dict(target_means=[0, 0, 0, 0],
                                           target_stds=[1, 1, 1, 1]),
                           loss_cls=dict(type="CrossEntropyLoss",
                                         use_sigmoid=True),
                           loss_bbox=dict(type="L1Loss"))),
        dict(rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                    neg_iou_thr=0.3, min_pos_iou=0.3,
                                    match_low_quality=True),
                      sampler=dict(type="RandomSampler", num=64,
                                   pos_fraction=0.5))),
        dict(rpn=dict(nms_pre=100, max_per_img=16,
                      nms=dict(iou_threshold=0.7), min_bbox_size=0)))
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
    assert all(np.isfinite(float(v)) for v in losses.values())
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 16, 5)
    assert bool(jnp.all(dets.labels == 0))
