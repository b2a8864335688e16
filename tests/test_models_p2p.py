import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.models import build_detector


def tiny_p2p_cfg(num_classes=3, topk=3):
    model_cfg = dict(
        type="BasicLocator",
        backbone=dict(type="ResNet", depth=18, base_channels=8),
        neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
                  start_level=0, add_extra_convs="on_input", num_outs=1),
        bbox_head=dict(type="P2PHead", num_classes=num_classes, in_channels=16,
                       feat_channels=16, stacked_convs=2, strides=[4],
                       point_anchor=[(0.0, 0.0)],
                       norm_cfg=dict(type="GN", num_groups=4),
                       loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                     gamma=2.0, alpha=0.25, loss_weight=1.0),
                       loss_reg=dict(type="SmoothL1Loss", beta=1.0 / 9.0,
                                     loss_weight=0.5),
                       pts_gamma=1, reg_norm=1))
    train_cfg = dict(
        neg_weight=1.0,
        assigner=dict(type="HungarianAssignerV2",
                      cls_costs=dict(type="FocalLossCost", weight=2.0),
                      reg_costs=dict(type="DisCostV2", weight=0.1,
                                     norm_with_img_wh=False),
                      topk_k=topk),
        sampler=dict(type="PseudoSampler"))
    test_cfg = dict(nms_pre=100, score_thr=0.05, pseudo_wh=(32, 32),
                    nms=dict(type="nms", iou_threshold=0.01), max_per_img=20)
    return model_cfg, train_cfg, test_cfg


@pytest.fixture(scope="module")
def p2p_model():
    model_cfg, train_cfg, test_cfg = tiny_p2p_cfg()
    model = build_detector(model_cfg, train_cfg, test_cfg)
    img = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    return model, variables


def _demo_batch(rng_seed=0, b=2, g=5):
    rng = np.random.RandomState(rng_seed)
    boxes = rng.rand(b, g, 4).astype(np.float32) * 30
    boxes[..., 2:] += boxes[..., :2] + 4
    return dict(
        gt_bboxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(rng.randint(0, 3, (b, g)), jnp.int32),
        gt_valid=jnp.asarray([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]], bool),
        img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32),
    )


def test_p2p_forward_shapes(p2p_model):
    model, variables = p2p_model
    img = jnp.zeros((2, 64, 64, 3))
    cls_outs, pts_outs = model.apply(variables, img)
    assert len(cls_outs) == 1 and len(pts_outs) == 1
    assert cls_outs[0].shape == (2, 16, 16, 3)   # K=1 * num_cls_out=3
    assert pts_outs[0].shape == (2, 16, 16, 2)   # K=1 * 2


def test_p2p_loss_counts_positives(p2p_model):
    model, variables = p2p_model
    img = jnp.zeros((2, 64, 64, 3))
    batch = _demo_batch()
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    # (3 + 1 valid gts) * topk_k=3 positives
    assert float(losses["num_pos"]) == 12.0
    assert np.isfinite(float(losses["loss_cls"]))
    assert np.isfinite(float(losses["loss_pts"]))


def test_p2p_gradients_flow(p2p_model):
    model, variables = p2p_model
    img = jnp.ones((2, 64, 64, 3)) * 0.1
    batch = _demo_batch()

    def total(v):
        l, _ = model.apply(v, img, batch, method=model.forward_train,
                           mutable=["batch_stats"])
        return l["loss_cls"] + l["loss_pts"]

    g = jax.grad(total)(variables)
    leaves = jax.tree_util.tree_leaves(g["params"])
    total_g = sum(float(jnp.abs(x).sum()) for x in leaves)
    assert np.isfinite(total_g) and total_g > 0


def test_p2p_simple_test_shapes(p2p_model):
    model, variables = p2p_model
    img = jnp.zeros((2, 64, 64, 3))
    dets, pts = model.apply(variables, img,
                            jnp.asarray([[64, 64], [60, 62]]),
                            method=model.simple_test)
    assert dets.bboxes.shape == (2, 20, 5)
    assert dets.labels.shape == (2, 20)
    assert pts.shape == (2, 20, 3)


def test_p2p_train_step_jits(p2p_model):
    model, variables = p2p_model
    img = jnp.zeros((2, 64, 64, 3))
    batch = _demo_batch()

    @jax.jit
    def step(v, img, batch):
        l, _ = model.apply(v, img, batch, method=model.forward_train,
                           mutable=["batch_stats"])
        return l

    l1 = step(variables, img, batch)
    l2 = step(variables, img, batch)  # cached path
    assert float(l1["loss_cls"]) == float(l2["loss_cls"])
