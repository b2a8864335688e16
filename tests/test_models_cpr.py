import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.models import build_detector
from pointtinybenchmark_tpu.models.dense_heads.cpr_head import circle_offsets


def test_circle_offsets_geometry():
    offs = circle_offsets(radius=3, base_num_point=8, stride=4)
    # rings of 8, 16, 24 points at radii 4, 8, 12
    assert offs.shape == (48, 2)
    radii = np.linalg.norm(offs, axis=1)
    np.testing.assert_allclose(radii[:8], 4.0, rtol=1e-5)
    np.testing.assert_allclose(radii[8:24], 8.0, rtol=1e-5)
    np.testing.assert_allclose(radii[24:], 12.0, rtol=1e-5)
    # first point of first ring at angle 0 -> (r, 0)
    np.testing.assert_allclose(offs[0], [4.0, 0.0], atol=1e-5)


def _cpr_model(num_classes=3, policy="only_refine_bag", with_gt=True):
    return build_detector(
        dict(type="BasicLocator",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0,
                       add_extra_convs="on_input", num_outs=1),
             bbox_head=dict(
                 type="CPRHead", num_classes=num_classes, in_channels=16,
                 feat_channels=16, stacked_convs=1, num_cls_fcs=0,
                 strides=[4], norm_cfg=dict(type="GN", num_groups=4),
                 loss_mil=dict(type="MILLoss", binary_ins=False,
                               loss_weight=0.25),
                 loss_cfg=dict(with_neg=True, neg_loss_weight=0.75,
                               refine_bag_policy=policy,
                               random_remove_rate=0.4,
                               with_gt_loss=with_gt, gt_loss_weight=0.125,
                               with_mil_loss=True),
                 normal_cfg=dict(prob_cls_type="sigmoid", out_bg_cls=False),
                 train_pts_extractor=dict(
                     pos_generator=dict(type="CirclePtFeatGenerator", radius=3),
                     neg_generator=dict(type="OutCirclePtFeatGenerator",
                                        radius=3, class_wise=True)),
                 refine_pts_extractor=dict(
                     pos_generator=dict(type="CirclePtFeatGenerator", radius=3),
                     neg_generator=dict(type="OutCirclePtFeatGenerator",
                                        radius=3, keep_wh=True,
                                        class_wise=True)),
                 point_refiner=dict(merge_th=0.1, refine_th=0.1,
                                    classify_filter=True,
                                    nearest_filter=True))),
        None,
        dict(nms_pre=2000, score_thr=0.05,
             nms=dict(type="nms", iou_threshold=0.5), max_per_img=1000))


def _batch():
    rng = np.random.RandomState(1)
    bb = rng.rand(2, 4, 4).astype(np.float32) * 40 + 8
    bb[..., 2:] = bb[..., :2] + 8
    return dict(
        gt_bboxes=jnp.asarray(bb),
        gt_labels=jnp.asarray([[0, 1, 2, 0], [1, 0, 0, 0]], jnp.int32),
        gt_valid=jnp.asarray([[1, 1, 1, 0], [1, 0, 0, 0]], bool),
        img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32),
    )


@pytest.fixture(scope="module")
def cpr():
    model = _cpr_model()
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    return model, variables, img


def test_cpr_train_losses(cpr):
    model, variables, img = cpr
    losses = model.apply(variables, img, _batch(),
                         method=model.forward_train,
                         rngs={"sampler": jax.random.PRNGKey(2)})
    assert set(losses) == {"loss_pos", "loss_neg", "loss_gt", "bag_acc"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert 0 <= float(losses["bag_acc"]) <= 100


def test_cpr_gradients(cpr):
    model, variables, img = cpr
    batch = _batch()

    def total(v):
        l = model.apply(v, img, batch, method=model.forward_train,
                        rngs={"sampler": jax.random.PRNGKey(2)})
        return l["loss_pos"] + l["loss_neg"] + l["loss_gt"]

    g = jax.grad(total)(variables)
    gn = sum(float(jnp.abs(x).sum())
             for x in jax.tree_util.tree_leaves(g["params"]))
    assert np.isfinite(gn) and gn > 0


def test_cpr_refine_fallback_and_radius(cpr):
    """Untrained net: scores < refine_th -> refined point == original point;
    trained or not, refined points stay within the bag radius."""
    model, variables, img = cpr
    batch = _batch()
    pts, scores, boxes, not_refine = model.apply(
        variables, img, batch, method=model.refine_test)
    centers = (np.asarray(batch["gt_bboxes"])[..., :2]
               + np.asarray(batch["gt_bboxes"])[..., 2:]) / 2
    d = np.linalg.norm(np.asarray(pts) - centers, axis=-1)
    valid = np.asarray(batch["gt_valid"])
    assert (d[valid] <= 3 * 4 + 1e-3).all()  # radius * stride
    assert boxes.shape == (2, 4, 4)
    # pseudo boxes are 16x16 around the refined point
    wh = np.asarray(boxes)[..., 2:] - np.asarray(boxes)[..., :4][..., :2]
    np.testing.assert_allclose(wh[valid], 16.0, atol=1e-4)


def test_cpr_bag_policies():
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    batch = _batch()
    batch = {k: v[:1] for k, v in batch.items()}
    for policy in ("independent_with_gt_bag", "merge_to_gt_bag",
                   "only_refine_bag"):
        model = _cpr_model(policy=policy)
        variables = model.init(jax.random.PRNGKey(0), img, train=False)
        losses = model.apply(variables, img, batch,
                             method=model.forward_train,
                             rngs={"sampler": jax.random.PRNGKey(2)})
        assert np.isfinite(float(losses["loss_pos"])), policy


def test_cpr_padded_gts_do_not_contribute():
    """A batch whose only difference is extra padded (invalid) gts must give
    identical losses."""
    model = _cpr_model(with_gt=True)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    bb = np.full((1, 2, 4), 20.0, np.float32)
    bb[..., 2:] += 8
    base = dict(gt_bboxes=jnp.asarray(bb),
                gt_labels=jnp.asarray([[1, 0]], jnp.int32),
                gt_valid=jnp.asarray([[True, False]]),
                img_shape=jnp.asarray([[64, 64]], jnp.int32))
    bb4 = np.concatenate([bb, np.tile(bb[:, :1], (1, 2, 1))], axis=1)
    padded = dict(gt_bboxes=jnp.asarray(bb4),
                  gt_labels=jnp.asarray([[1, 0, 2, 2]], jnp.int32),
                  gt_valid=jnp.asarray([[True, False, False, False]]),
                  img_shape=jnp.asarray([[64, 64]], jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    # random_remove uses rng over differently-shaped masks; disable via fresh
    # model with rate 0 for exactness
    model0 = _cpr_model()
    import dataclasses
    l1 = model.apply(variables, img, base, method=model.forward_train,
                     rngs={"sampler": jax.random.PRNGKey(9)})
    l2 = model.apply(variables, img, padded, method=model.forward_train,
                     rngs={"sampler": jax.random.PRNGKey(9)})
    # loss_gt and loss_neg are deterministic (no dropout on those paths)
    np.testing.assert_allclose(float(l1["loss_gt"]), float(l2["loss_gt"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(l1["loss_neg"]), float(l2["loss_neg"]),
                               rtol=1e-5)


def test_cascade_cpr_refine():
    """CPR++-style cascade: multiple refinement stages run and stay within
    the cumulative bag radius."""
    model = build_detector(
        dict(type="BasicLocator",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0,
                       add_extra_convs="on_input", num_outs=1),
             bbox_head=dict(
                 type="CascadeCPRHead", cascade_stages=2,
                 num_classes=2, in_channels=16, feat_channels=16,
                 stacked_convs=1, strides=[4],
                 norm_cfg=dict(type="GN", num_groups=4),
                 train_pts_extractor=dict(
                     pos_generator=dict(type="CirclePtFeatGenerator",
                                        radius=2),
                     neg_generator=dict(type="OutCirclePtFeatGenerator",
                                        radius=2)),
                 refine_pts_extractor=dict(
                     pos_generator=dict(type="CirclePtFeatGenerator",
                                        radius=2),
                     neg_generator=dict(type="OutCirclePtFeatGenerator",
                                        radius=2)),
                 point_refiner=dict(merge_th=0.0, refine_th=0.0))),
        None, dict(max_per_img=10))
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    bb = np.full((1, 3, 4), 24.0, np.float32)
    bb[..., 2:] += 8
    batch = dict(gt_bboxes=jnp.asarray(bb),
                 gt_labels=jnp.asarray([[0, 1, 0]], jnp.int32),
                 gt_valid=jnp.asarray([[True, True, False]]),
                 img_shape=jnp.asarray([[64, 64]], jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    pts, scores, boxes, not_refine = model.apply(
        variables, img, batch, method=model.refine_test)
    assert pts.shape == (1, 3, 2)
    centers = (bb[..., :2] + bb[..., 2:]) / 2
    d = np.linalg.norm(np.asarray(pts) - centers, axis=-1)
    # two stages, radius 2*stride 4 each -> at most 16 px total movement
    assert (d[np.asarray(batch["gt_valid"])] <= 16 + 1e-3).all()
    # training still works through the cascade head (single-stage loss)
    losses = model.apply(variables, img, batch, method=model.forward_train,
                         rngs={"sampler": jax.random.PRNGKey(1)})
    assert np.isfinite(float(losses["loss_pos"]))


def test_cpr_grid_generator_variants():
    """Grid/GridCircles/GridEllipse pos-generator variants: bag points snap
    to the feature grid; ellipse validity gates the pair-based stamp."""
    from pointtinybenchmark_tpu.models.dense_heads.cpr_head import (
        CPRHead, grid_offsets)
    offs = grid_offsets(2, 4.0)
    # 13 cells in an L2-radius-2 disc, scaled by stride
    assert offs.shape == (13, 2)
    assert (np.abs(offs) % 4 == 0).all()

    head = CPRHead(
        num_classes=2, in_channels=8, feat_channels=8, stacked_convs=1,
        strides=(4,),
        train_pts_extractor=dict(
            pos_generator=dict(type="GridCirclesPtFeatGenerator", radius=2),
            neg_generator=dict(type="OutCirclePtFeatGenerator", radius=3)),
        refine_pts_extractor=dict(
            pos_generator=dict(type="GridEllipsePtFeatGenerator", radius=3,
                               a_minus_c=1.0),
            neg_generator=dict(type="OutCirclePtFeatGenerator", radius=3)),
        point_refiner=dict(merge_th=0.05, refine_th=0.05))
    feats = (jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 8),
                         jnp.float32),)
    pts = jnp.asarray([[[[24.0, 24.0], [28.0, 26.0]]]])  # (1, 1, 2, 2)
    batch = dict(gt_points=pts,
                 gt_labels=jnp.asarray([[0]], jnp.int32),
                 gt_valid=jnp.asarray([[True]]),
                 pad_shape=(64, 64))
    v = head.init(jax.random.PRNGKey(0), feats, batch, mode="train")
    out = head.apply(v, feats, batch, mode="train")
    # grid bags: every valid bag point lies on the stride-4 grid
    bag = np.asarray(out["bag_pts"])[np.asarray(out["bag_valid"])]
    assert (bag % 4 == 0).all()
    # refine mode exercises the ellipse validity path
    out = head.apply(v, feats, batch, mode="refine")
    assert np.asarray(out["bag_valid"]).sum() > 0
