import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.models import build_detector
from pointtinybenchmark_tpu.models.dense_heads.reppoints_head import point_assign


def test_point_assign_level_and_nearest():
    # points on two levels (stride 4 and 8)
    pts = jnp.asarray([[10., 10.], [30., 30.], [12., 12.], [32., 32.]])
    strides = np.asarray([4., 4., 8., 8.], np.float32)
    # gt of size ~8 -> lvl log2(8/4)=1 ... scale=4: lvl=(log2(w/4)+log2(h/4))/2
    gts = jnp.asarray([[6., 6., 14., 14.]])   # 8x8 -> lvl 1 -> stride-2^1?
    assigned = point_assign(pts, strides, gts, jnp.asarray([True]),
                            scale=4.0, pos_num=1)
    a = np.asarray(assigned)
    assert (a > 0).sum() == 1  # exactly one point assigned
    # the assigned point must be at the gt's level (lvl 1 = stride 2? clamp to
    # available [2,3]): gt lvl = log2(8/4)=1 -> clamped to min lvl 2 (stride 4)
    assert a[0] == 1 or a[2] == 1


def test_point_assign_no_gt():
    pts = jnp.asarray([[10., 10.]])
    strides = np.asarray([4.], np.float32)
    assigned = point_assign(pts, strides, jnp.zeros((2, 4)),
                            jnp.zeros(2, bool))
    assert np.asarray(assigned).tolist() == [0]


@pytest.fixture(scope="module")
def reppoints():
    model = build_detector(
        dict(type="RepPointsDetector",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0,
                       add_extra_convs="on_input", num_outs=5,
                       norm_cfg=dict(type="GN", num_groups=4)),
             bbox_head=dict(type="RepPointsHead", num_classes=2,
                            in_channels=16, feat_channels=16,
                            point_feat_channels=16, stacked_convs=1,
                            point_strides=[4, 8, 16, 32, 64],
                            point_base_scale=2,
                            norm_cfg=dict(type="GN", num_groups=4),
                            transform_method="moment")),
        dict(init=dict(assigner=dict(type="PointAssigner", scale=4,
                                     pos_num=1), pos_weight=-1),
             refine=dict(assigner=dict(type="MaxIoUAssigner",
                                       pos_iou_thr=0.5, neg_iou_thr=0.4,
                                       min_pos_iou=0, ignore_iof_thr=-1),
                         pos_weight=-1)),
        dict(nms_pre=200, score_thr=0.05,
             nms=dict(type="nms", iou_threshold=0.5), max_per_img=50))
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    return model, variables, img


def _batch():
    rng = np.random.RandomState(1)
    bb = rng.rand(2, 5, 4).astype(np.float32) * 30
    bb[..., 2:] = bb[..., :2] + 6 + rng.rand(2, 5, 2).astype(np.float32) * 20
    return dict(gt_bboxes=jnp.asarray(bb),
                gt_labels=jnp.asarray(rng.randint(0, 2, (2, 5)), jnp.int32),
                gt_valid=jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 0, 0, 0]], bool),
                img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32))


def test_reppoints_losses_and_grads(reppoints):
    model, variables, img = reppoints
    losses, _ = model.apply(variables, img, _batch(),
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert {"loss_cls", "loss_pts_init", "loss_pts_refine"} <= set(losses)
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert float(losses["num_pos"]) > 0

    def total(v):
        l, _ = model.apply(v, img, _batch(), method=model.forward_train,
                           mutable=["batch_stats"])
        return sum(x for k, x in l.items() if k.startswith("loss"))

    g = jax.grad(total)(variables)
    # moment_transfer must receive gradient (the moment_mul trick keeps a
    # small direct path)
    mt = float(jnp.abs(g["params"]["bbox_head_m"]["moment_transfer"]).sum())
    assert mt > 0


def test_reppoints_inference(reppoints):
    model, variables, img = reppoints
    dets, _ = model.apply(variables, img, jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 50, 5)
