"""PISA SSD head — ISR-P + CARL over hard-negative-mined SSD loss."""
import numpy as np

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.models import build_detector


def test_pisa_ssd():
    model = build_detector(
        dict(type="SSD",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=1, num_outs=3),
             bbox_head=dict(type="PISASSDHead", num_classes=2,
                            in_channels=16,
                            anchor_generator=dict(
                                type="SSDAnchorGenerator",
                                strides=[8, 16, 32],
                                ratios=[[2], [2, 3], [2]],
                                min_sizes=[16, 32, 64],
                                max_sizes=[32, 64, 128]),
                            bbox_coder=dict(
                                target_means=[0, 0, 0, 0],
                                target_stds=[0.1, 0.1, 0.2, 0.2]),
                            loss_bbox=dict(type="SmoothL1Loss", beta=1.0))),
        dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                           neg_iou_thr=0.5, min_pos_iou=0.0,
                           gt_max_assign_all=False),
             isr=dict(k=2.0, bias=0.25), carl=dict(k=1.0, bias=0.2)),
        dict(nms_pre=200, score_thr=0.02,
             nms=dict(iou_threshold=0.45), max_per_img=30))
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

    def loss_fn(v):
        losses, _ = model.apply(v, img, batch, method=model.forward_train,
                                mutable=["batch_stats"])
        return sum(jnp.sum(x) for k, x in losses.items()
                   if k.startswith("loss")), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables)
    assert np.isfinite(float(total)), losses
    assert "loss_carl" in losses
    gn = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.asarray(x, jnp.float32) ** 2)),
        grads["params"], 0.0)
    assert np.isfinite(gn) and gn > 0
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[128, 128], [120, 124]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 30, 5)
