"""Grid R-CNN, PointRend, Double-Head, SABL second-stage variants."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.models import build_detector

_RPN = dict(type="RPNHead", num_classes=1, in_channels=16, feat_channels=16,
            anchor_generator=dict(type="AnchorGenerator", scales=[2],
                                  ratios=[0.5, 1.0, 2.0],
                                  strides=[4, 8, 16, 32]),
            bbox_coder=dict(target_means=[0, 0, 0, 0],
                            target_stds=[1, 1, 1, 1]),
            loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True),
            loss_bbox=dict(type="L1Loss"))
_EXTRACT = dict(roi_layer=dict(type="RoIAlign", output_size=7,
                               sampling_ratio=0),
                out_channels=16, featmap_strides=[4, 8, 16, 32])
_TRAIN = dict(
    rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                           neg_iou_thr=0.3, min_pos_iou=0.3,
                           match_low_quality=True),
             sampler=dict(type="RandomSampler", num=64, pos_fraction=0.5)),
    rpn_proposal=dict(nms_pre=100, max_per_img=32,
                      nms=dict(iou_threshold=0.7), min_bbox_size=0),
    rcnn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                            neg_iou_thr=0.5, min_pos_iou=0.5),
              sampler=dict(type="RandomSampler", num=32, pos_fraction=0.25),
              num_points=32, oversample_ratio=2,
              importance_sample_ratio=0.75))
_TEST = dict(rpn=dict(nms_pre=100, max_per_img=32,
                      nms=dict(iou_threshold=0.7), min_bbox_size=0),
             rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                       max_per_img=8, subdivision_steps=2,
                       subdivision_num_points=64))


def _batch(with_masks=False, seed=1):
    rng = np.random.RandomState(seed)
    bb = rng.rand(2, 5, 4).astype(np.float32) * 30
    bb[..., 2:] = bb[..., :2] + 8 + rng.rand(2, 5, 2).astype(np.float32) * 20
    out = dict(gt_bboxes=jnp.asarray(bb),
               gt_labels=jnp.asarray(rng.randint(0, 2, (2, 5)), jnp.int32),
               gt_valid=jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 0, 0, 0]],
                                    bool),
               img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32))
    if with_masks:
        masks = np.zeros((2, 5, 64, 64), np.uint8)
        for b_ in range(2):
            for g_ in range(5):
                x1, y1, x2, y2 = bb[b_, g_].astype(int)
                masks[b_, g_, y1:y2, x1:x2] = 1
        out["gt_masks"] = jnp.asarray(masks)
    return out


def _detector(roi_head):
    return build_detector(
        dict(type="FasterRCNN",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0, num_outs=4),
             rpn_head=_RPN, roi_head=roi_head),
        _TRAIN, _TEST)


def _drive(model, with_masks=False, expect=(), seed=0):
    batch = _batch(with_masks)
    img = jnp.asarray(np.random.RandomState(seed).rand(2, 64, 64, 3),
                      jnp.float32)
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
    gn = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.asarray(x, jnp.float32) ** 2)),
        grads["params"], 0.0)
    assert np.isfinite(gn) and gn > 0
    for k in expect:
        assert k in losses, sorted(losses)
    out, _ = model.apply(variables, img, batch["img_shape"],
                         method=model.simple_test)
    return losses, out


@pytest.mark.slow
def test_grid_rcnn():
    model = _detector(dict(
        type="GridRoIHead",
        bbox_roi_extractor=_EXTRACT,
        bbox_head=dict(type="Shared2FCBBoxHead", num_classes=2,
                       in_channels=16, fc_out_channels=32, roi_feat_size=7),
        grid_roi_extractor=dict(roi_layer=dict(type="RoIAlign",
                                               output_size=7,
                                               sampling_ratio=0),
                                out_channels=16,
                                featmap_strides=[4, 8, 16, 32]),
        grid_head=dict(type="GridHead", num_convs=2, in_channels=16,
                       feat_channels=16, point_feat_channels=8)))
    losses, dets = _drive(model, expect=("loss_grid",))
    # refined boxes remain well-formed
    assert bool(jnp.all(dets.bboxes[..., 2] >= dets.bboxes[..., 0] - 1e-3))


@pytest.mark.slow
def test_point_rend():
    model = _detector(dict(
        type="PointRendRoIHead",
        bbox_roi_extractor=_EXTRACT,
        bbox_head=dict(type="Shared2FCBBoxHead", num_classes=2,
                       in_channels=16, fc_out_channels=32, roi_feat_size=7),
        mask_head=dict(type="FCNMaskHead", num_convs=1, in_channels=16,
                       conv_out_channels=16, num_classes=2),
        point_head=dict(type="MaskPointHead", num_fcs=2, in_channels=16,
                        fc_channels=16)))
    losses, out = _drive(model, with_masks=True,
                         expect=("loss_mask", "loss_point"))
    dets, seg = out
    # 14 -> two subdivision steps -> 56
    assert seg.shape == (2, 8, 56, 56)
    assert float(jnp.min(seg)) >= 0 and float(jnp.max(seg)) <= 1


@pytest.mark.slow
def test_double_head():
    model = _detector(dict(
        type="StandardRoIHead",
        bbox_roi_extractor=_EXTRACT,
        bbox_head=dict(type="DoubleConvFCBBoxHead", num_classes=2,
                       in_channels=16, conv_out_channels=16,
                       fc_out_channels=32, num_convs=1, num_fcs=1,
                       reg_class_agnostic=False, roi_feat_size=7)))
    _drive(model, expect=("loss_cls", "loss_bbox"))


@pytest.mark.slow
def test_sabl_roi_head():
    model = _detector(dict(
        type="SABLRoIHead",
        bbox_roi_extractor=_EXTRACT,
        bbox_head=dict(type="SABLHead", num_classes=2, in_channels=16,
                       num_buckets=14, cls_out_channels=32,
                       reg_feat_out_channels=16, reg_out_channels=32,
                       roi_feat_size=7)))
    losses, dets = _drive(model, expect=("loss_cls", "loss_bbox_cls",
                                         "loss_bbox_reg"))
    assert dets.bboxes.shape[-1] == 5


def test_grid_targets_and_refine_roundtrip():
    """A perfect heatmap at the gt lattice points must refine the roi onto
    the gt box."""
    from pointtinybenchmark_tpu.models.roi_heads.grid_roi_head import (
        grid_targets, grid_refine_boxes)
    rois = jnp.asarray([[0.0, 10, 10, 40, 40]])
    gt = jnp.asarray([[14, 12, 36, 38]])
    t = grid_targets(rois, gt, 56)
    assert t.shape == (1, 56, 56, 9)
    # use targets as (hard) heatmaps -> refine
    ref = grid_refine_boxes(rois, t)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(gt[0]),
                               atol=0.8)
