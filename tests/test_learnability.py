"""Convergence sanity: a tiny detector must learn to find bright squares on
black within a few hundred steps. Catches sign/assignment/decode errors that
shape-level tests can't (the reference relies on full benchmark runs for
this; a synthetic micro-benchmark gives the same signal in seconds)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from pointtinybenchmark_tpu.engine.train import init_model, make_train_step
from pointtinybenchmark_tpu.models import build_detector


def _make_data(n_imgs=16, size=64, seed=0):
    rng = np.random.RandomState(seed)
    imgs, boxes, valids = [], [], []
    max_g = 2
    for _ in range(n_imgs):
        img = rng.rand(size, size, 3).astype(np.float32) * 0.1
        bb = np.zeros((max_g, 4), np.float32)
        vv = np.zeros((max_g,), bool)
        for g in range(rng.randint(1, max_g + 1)):
            x, y = rng.randint(4, size - 16, 2)
            w = h = rng.randint(8, 14)
            img[y:y + h, x:x + w] = 1.0
            bb[g] = (x, y, x + w, y + h)
            vv[g] = True
        imgs.append(img)
        boxes.append(bb)
        valids.append(vv)
    return (np.stack(imgs), np.stack(boxes), np.stack(valids))


@pytest.mark.slow
def test_retina_learns_synthetic_squares():
    model = build_detector(
        dict(type="SingleStageDetector",
             backbone=dict(type="ResNet", depth=18, base_channels=16,
                           norm_eval=False),
             neck=dict(type="FPN", in_channels=[16, 32, 64, 128],
                       out_channels=32, start_level=0,
                       add_extra_convs="on_input", num_outs=5),
             bbox_head=dict(
                 type="RetinaHead", num_classes=1, in_channels=32,
                 feat_channels=32, stacked_convs=1,
                 anchor_generator=dict(type="AnchorGenerator",
                                       octave_base_scale=2,
                                       scales_per_octave=3,
                                       ratios=[1.0],
                                       strides=[4, 8, 16, 32, 64]),
                 bbox_coder=dict(target_means=[0, 0, 0, 0],
                                 target_stds=[1, 1, 1, 1]),
                 loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                               gamma=2.0, alpha=0.25, loss_weight=1.0),
                 loss_bbox=dict(type="L1Loss", loss_weight=1.0))),
        dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                           neg_iou_thr=0.4, min_pos_iou=0.3,
                           ignore_iof_thr=-1),
             allowed_border=-1, pos_weight=-1),
        dict(nms_pre=200, score_thr=0.2,
             nms=dict(type="nms", iou_threshold=0.5), max_per_img=10))

    imgs, boxes, valids = _make_data()
    b = 8
    tx = optax.adam(2e-3)
    batch0 = dict(img=jnp.asarray(imgs[:b]))
    params, batch_stats = init_model(model, batch0)
    state = dict(params=params, batch_stats=batch_stats,
                 opt_state=tx.init(params), step=jnp.int32(0))
    train_step = make_train_step(model, tx)

    rng = jax.random.PRNGKey(0)
    n = len(imgs)
    first_loss = last_loss = None
    for step in range(150):
        sel = np.random.RandomState(step).choice(n, b, replace=False)
        batch = dict(img=jnp.asarray(imgs[sel]),
                     gt_bboxes=jnp.asarray(boxes[sel]),
                     gt_labels=jnp.zeros((b, boxes.shape[1]), jnp.int32),
                     gt_valid=jnp.asarray(valids[sel]),
                     img_shape=jnp.tile(jnp.asarray([[64, 64]], jnp.int32),
                                        (b, 1)))
        rng, k = jax.random.split(rng)
        state, metrics = train_step(state, batch, k)
        loss = float(metrics["loss"])
        if first_loss is None:
            first_loss = loss
        last_loss = loss
    assert last_loss < first_loss * 0.5, (first_loss, last_loss)

    # detection quality: the top detection on each image must hit a gt
    variables = {"params": state["params"]}
    if state["batch_stats"]:
        variables["batch_stats"] = state["batch_stats"]
    dets, _ = model.apply(variables, jnp.asarray(imgs[:b]),
                          jnp.tile(jnp.asarray([[64, 64]], jnp.int32),
                                   (b, 1)),
                          method=model.simple_test)
    db = np.asarray(dets.bboxes)
    dv = np.asarray(dets.valid)
    hits = 0
    for i in range(b):
        if not dv[i].any():
            continue
        top = db[i][dv[i]][0]
        gts = boxes[i][valids[i]]
        ious = []
        for g in gts:
            ix1, iy1 = max(top[0], g[0]), max(top[1], g[1])
            ix2, iy2 = min(top[2], g[2]), min(top[3], g[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            a1 = (top[2] - top[0]) * (top[3] - top[1])
            a2 = (g[2] - g[0]) * (g[3] - g[1])
            ious.append(inter / max(a1 + a2 - inter, 1e-6))
        hits += max(ious) > 0.3
    assert hits >= b // 2, f"only {hits}/{b} top detections hit a gt"


@pytest.mark.slow
def test_p2p_learns_point_localization():
    """The point stack (auction matching -> focal+reg losses) must learn to
    place points on bright squares."""
    model = build_detector(
        dict(type="BasicLocator",
             backbone=dict(type="ResNet", depth=18, base_channels=16,
                           norm_eval=False),
             neck=dict(type="FPN", in_channels=[16, 32, 64, 128],
                       out_channels=32, start_level=0,
                       add_extra_convs="on_input", num_outs=1),
             bbox_head=dict(
                 type="P2PHead", num_classes=1, in_channels=32,
                 feat_channels=32, stacked_convs=2, strides=[4],
                 point_anchor=[(0.0, 0.0)],
                 norm_cfg=dict(type="GN", num_groups=8),
                 loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                               gamma=2.0, alpha=0.25, loss_weight=1.0),
                 loss_reg=dict(type="SmoothL1Loss", beta=1.0 / 9.0,
                               loss_weight=0.5),
                 pts_gamma=1, reg_norm=1)),
        dict(neg_weight=1.0,
             assigner=dict(type="HungarianAssignerV2",
                           cls_costs=dict(type="FocalLossCost", weight=2.0),
                           reg_costs=dict(type="DisCostV2", weight=0.1,
                                          norm_with_img_wh=False),
                           topk_k=1),
             sampler=dict(type="PseudoSampler")),
        dict(nms_pre=100, score_thr=0.2, pseudo_wh=(12, 12),
             nms=dict(type="nms", iou_threshold=0.3), max_per_img=5))

    imgs, boxes, valids = _make_data(seed=3)
    b = 8
    tx = optax.adam(2e-3)
    params, batch_stats = init_model(model, dict(img=jnp.asarray(imgs[:b])))
    state = dict(params=params, batch_stats=batch_stats,
                 opt_state=tx.init(params), step=jnp.int32(0))
    train_step = make_train_step(model, tx)
    rng = jax.random.PRNGKey(0)
    first = last = None
    for step in range(200):
        sel = np.random.RandomState(step).choice(len(imgs), b, replace=False)
        batch = dict(img=jnp.asarray(imgs[sel]),
                     gt_bboxes=jnp.asarray(boxes[sel]),
                     gt_labels=jnp.zeros((b, boxes.shape[1]), jnp.int32),
                     gt_valid=jnp.asarray(valids[sel]),
                     img_shape=jnp.tile(jnp.asarray([[64, 64]], jnp.int32),
                                        (b, 1)))
        rng, k = jax.random.split(rng)
        state, metrics = train_step(state, batch, k)
        if first is None:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
    assert last < first * 0.7, (first, last)

    variables = {"params": state["params"]}
    if state["batch_stats"]:
        variables["batch_stats"] = state["batch_stats"]
    dets, pts = model.apply(variables, jnp.asarray(imgs[:b]),
                            jnp.tile(jnp.asarray([[64, 64]], jnp.int32),
                                     (b, 1)),
                            method=model.simple_test)
    pp = np.asarray(pts)
    dv = np.asarray(dets.valid)
    hits = 0
    for i in range(b):
        if not dv[i].any():
            continue
        cx, cy = pp[i][dv[i]][0][:2]
        centers = (boxes[i][valids[i]][:, :2]
                   + boxes[i][valids[i]][:, 2:]) / 2
        d = np.linalg.norm(centers - np.asarray([cx, cy]), axis=1)
        hits += d.min() < 8
    assert hits >= b // 2, f"only {hits}/{b} top points near a gt center"


@pytest.mark.slow
def test_cpr_refines_noisy_points_toward_centers():
    """Flagship check: after MIL training on noisy annotated points, CPR's
    refined points must be closer to true object centers than the noisy
    annotations were (the paper's core claim, arXiv 2203.09338)."""
    model = build_detector(
        dict(type="BasicLocator",
             backbone=dict(type="ResNet", depth=18, base_channels=16,
                           norm_eval=False),
             neck=dict(type="FPN", in_channels=[16, 32, 64, 128],
                       out_channels=32, start_level=0,
                       add_extra_convs="on_input", num_outs=1),
             bbox_head=dict(
                 type="CPRHead", num_classes=1, in_channels=32,
                 feat_channels=32, stacked_convs=2, strides=[4],
                 norm_cfg=dict(type="GN", num_groups=8),
                 loss_mil=dict(type="MILLoss", binary_ins=False,
                               loss_weight=1.0),
                 loss_cfg=dict(with_neg=True, neg_loss_weight=1.0,
                               refine_bag_policy="independent_with_gt_bag",
                               random_remove_rate=0.0,
                               with_gt_loss=True, gt_loss_weight=0.25,
                               with_mil_loss=True),
                 train_pts_extractor=dict(
                     pos_generator=dict(type="CirclePtFeatGenerator",
                                        radius=3),
                     neg_generator=dict(type="OutCirclePtFeatGenerator",
                                        radius=3)),
                 refine_pts_extractor=dict(
                     pos_generator=dict(type="CirclePtFeatGenerator",
                                        radius=3),
                     neg_generator=dict(type="OutCirclePtFeatGenerator",
                                        radius=3)),
                 point_refiner=dict(merge_th=0.05, refine_th=0.05,
                                    gt_alpha=0.5,
                                    classify_filter=False,
                                    nearest_filter=True))),
        None, dict(max_per_img=10))

    # squares with annotated points offset from center (noisy points)
    rng = np.random.RandomState(7)
    n_imgs, size, max_g = 16, 64, 1   # one object/img: isolates refinement
    imgs = np.zeros((n_imgs, size, size, 3), np.float32)
    noisy = np.zeros((n_imgs, max_g, 4), np.float32)   # pseudo boxes
    centers = np.zeros((n_imgs, max_g, 2), np.float32)  # true centers
    valids = np.zeros((n_imgs, max_g), bool)
    for i in range(n_imgs):
        imgs[i] = rng.rand(size, size, 3) * 0.1
        for g in range(max_g):
            w = h = 14
            x, y = rng.randint(6, size - 22, 2)
            imgs[i, y:y + h, x:x + w] = 1.0
            cx, cy = x + w / 2, y + h / 2
            # annotated point: offset up to 5px from center (inside box)
            px = cx + rng.uniform(-5, 5)
            py = cy + rng.uniform(-5, 5)
            noisy[i, g] = (px - 4, py - 4, px + 4, py + 4)  # 8x8 pseudo box
            centers[i, g] = (cx, cy)
            valids[i, g] = True

    b = 8
    tx = optax.adam(2e-3)
    batch0 = dict(img=jnp.asarray(imgs[:b]))
    params, batch_stats = init_model(model, batch0)
    state = dict(params=params, batch_stats=batch_stats,
                 opt_state=tx.init(params), step=jnp.int32(0))
    train_step = make_train_step(model, tx)
    rng_j = jax.random.PRNGKey(0)
    for step in range(200):
        sel = np.random.RandomState(step).choice(n_imgs, b, replace=False)
        batch = dict(img=jnp.asarray(imgs[sel]),
                     gt_bboxes=jnp.asarray(noisy[sel]),
                     gt_labels=jnp.zeros((b, max_g), jnp.int32),
                     gt_valid=jnp.asarray(valids[sel]),
                     img_shape=jnp.tile(jnp.asarray([[64, 64]], jnp.int32),
                                        (b, 1)))
        rng_j, k = jax.random.split(rng_j)
        state, metrics = train_step(state, batch, k)
    assert np.isfinite(float(metrics["loss"]))

    variables = {"params": state["params"]}
    if state["batch_stats"]:
        variables["batch_stats"] = state["batch_stats"]
    batch = dict(gt_bboxes=jnp.asarray(noisy[:b]),
                 gt_labels=jnp.zeros((b, max_g), jnp.int32),
                 gt_valid=jnp.asarray(valids[:b]),
                 img_shape=jnp.tile(jnp.asarray([[64, 64]], jnp.int32),
                                    (b, 1)))
    pts, scores, bboxes, not_refine = model.apply(
        variables, jnp.asarray(imgs[:b]), batch, method=model.refine_test)
    pts = np.asarray(pts)
    noisy_pts = (noisy[:b, :, :2] + noisy[:b, :, 2:]) / 2
    v = valids[:b]
    d_before = np.linalg.norm(noisy_pts - centers[:b], axis=-1)[v]
    d_after = np.linalg.norm(pts - centers[:b], axis=-1)[v]
    frac_refined = 1 - float(np.asarray(not_refine)[v].mean())
    # refinement must reduce mean distance to the true centers
    assert d_after.mean() < d_before.mean() * 0.9, (
        d_before.mean(), d_after.mean(), frac_refined)


@pytest.mark.slow
def test_atss_learns_synthetic_squares():
    """ATSS end-to-end convergence: adaptive mean+std IoU thresholding must
    still produce a trainable positive set on synthetic bright squares."""
    model = build_detector(
        dict(type="SingleStageDetector",
             backbone=dict(type="ResNet", depth=18, base_channels=16,
                           norm_eval=False),
             neck=dict(type="FPN", in_channels=[16, 32, 64, 128],
                       out_channels=32, start_level=0,
                       add_extra_convs="on_input", num_outs=5),
             bbox_head=dict(
                 type="ATSSHead", num_classes=1, in_channels=32,
                 feat_channels=32, stacked_convs=1,
                 norm_cfg=dict(type="GN", num_groups=8),
                 anchor_generator=dict(type="AnchorGenerator",
                                       octave_base_scale=2,
                                       scales_per_octave=1,
                                       ratios=[1.0],
                                       strides=[4, 8, 16, 32, 64]),
                 bbox_coder=dict(target_means=[0, 0, 0, 0],
                                 target_stds=[0.1, 0.1, 0.2, 0.2]),
                 loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                               gamma=2.0, alpha=0.25, loss_weight=1.0),
                 loss_bbox=dict(type="GIoULoss", loss_weight=2.0))),
        dict(assigner=dict(type="ATSSAssigner", topk=9),
             allowed_border=-1, pos_weight=-1),
        dict(nms_pre=200, score_thr=0.2,
             nms=dict(type="nms", iou_threshold=0.6), max_per_img=10))

    imgs, boxes, valids = _make_data()
    b = 8
    tx = optax.adam(2e-3)
    batch0 = dict(img=jnp.asarray(imgs[:b]))
    params, batch_stats = init_model(model, batch0)
    state = dict(params=params, batch_stats=batch_stats,
                 opt_state=tx.init(params), step=jnp.int32(0))
    train_step = make_train_step(model, tx)

    rng = jax.random.PRNGKey(0)
    n = len(imgs)
    first_loss = last_loss = None
    for step in range(150):
        sel = np.random.RandomState(step).choice(n, b, replace=False)
        batch = dict(img=jnp.asarray(imgs[sel]),
                     gt_bboxes=jnp.asarray(boxes[sel]),
                     gt_labels=jnp.zeros((b, boxes.shape[1]), jnp.int32),
                     gt_valid=jnp.asarray(valids[sel]),
                     img_shape=jnp.tile(jnp.asarray([[64, 64]], jnp.int32),
                                        (b, 1)))
        rng, k = jax.random.split(rng)
        state, metrics = train_step(state, batch, k)
        loss = float(metrics["loss"])
        if first_loss is None:
            first_loss = loss
        last_loss = loss
    assert last_loss < first_loss * 0.5, (first_loss, last_loss)

    variables = {"params": state["params"]}
    if state["batch_stats"]:
        variables["batch_stats"] = state["batch_stats"]
    dets, _ = model.apply(variables, jnp.asarray(imgs[:b]),
                          jnp.tile(jnp.asarray([[64, 64]], jnp.int32),
                                   (b, 1)),
                          method=model.simple_test)
    db = np.asarray(dets.bboxes)
    dv = np.asarray(dets.valid)
    hits = 0
    for i in range(b):
        if not dv[i].any():
            continue
        top = db[i][dv[i]][0]
        gts = boxes[i][valids[i]]
        best = 0.0
        for g in gts:
            ix1, iy1 = max(top[0], g[0]), max(top[1], g[1])
            ix2, iy2 = min(top[2], g[2]), min(top[3], g[3])
            inter = max(0, ix2 - ix1) * max(0, iy2 - iy1)
            a1 = (top[2] - top[0]) * (top[3] - top[1])
            a2 = (g[2] - g[0]) * (g[3] - g[1])
            best = max(best, inter / max(a1 + a2 - inter, 1e-6))
        hits += best > 0.3
    assert hits >= b // 2, f"only {hits}/{b} top dets hit a gt"


@pytest.mark.slow
def test_faster_rcnn_learns_synthetic_squares():
    """Two-stage path (the 49.81-AP50 protocol flagship, reference
    faster_rcnn_r50_fpn_1x_TinyPerson640.py shape): RPN + RoI head must
    learn bright squares — catches proposal/sampling/second-stage decode
    errors the shape tests can't."""
    model = build_detector(
        dict(type="FasterRCNN",
             backbone=dict(type="ResNet", depth=18, base_channels=16,
                           norm_eval=False),
             neck=dict(type="FPN", in_channels=[16, 32, 64, 128],
                       out_channels=32, num_outs=5),
             rpn_head=dict(
                 type="RPNHead", num_classes=1, in_channels=32,
                 feat_channels=32,
                 anchor_generator=dict(type="AnchorGenerator", scales=[2],
                                       ratios=[1.0],
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
                                    sampling_ratio=1),
                     out_channels=32, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(type="Shared2FCBBoxHead", num_classes=1,
                                in_channels=32, fc_out_channels=64,
                                roi_feat_size=7))),
        dict(rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                    neg_iou_thr=0.3, min_pos_iou=0.3),
                      sampler=dict(type="RandomSampler", num=64,
                                   pos_fraction=0.5),
                      pos_weight=-1),
             rpn_proposal=dict(nms_pre=256, max_per_img=64,
                               nms=dict(iou_threshold=0.7), min_bbox_size=0),
             rcnn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                     neg_iou_thr=0.5, min_pos_iou=0.5),
                       sampler=dict(type="RandomSampler", num=64,
                                    pos_fraction=0.25,
                                    add_gt_as_proposals=True),
                       pos_weight=-1)),
        dict(rpn=dict(nms_pre=256, max_per_img=64,
                      nms=dict(iou_threshold=0.7), min_bbox_size=0),
             rcnn=dict(score_thr=0.2, nms=dict(iou_threshold=0.5),
                       max_per_img=10)))

    imgs, boxes, valids = _make_data(seed=3)
    b = 8
    tx = optax.adam(1e-3)
    batch0 = dict(img=jnp.asarray(imgs[:b]))
    params, batch_stats = init_model(model, batch0)
    state = dict(params=params, batch_stats=batch_stats,
                 opt_state=tx.init(params), step=jnp.int32(0))
    train_step = make_train_step(model, tx)

    rng = jax.random.PRNGKey(0)
    n = len(imgs)
    first_loss = last_loss = None
    for step in range(150):
        sel = np.random.RandomState(1000 + step).choice(n, b, replace=False)
        batch = dict(img=jnp.asarray(imgs[sel]),
                     gt_bboxes=jnp.asarray(boxes[sel]),
                     gt_labels=jnp.zeros((b, boxes.shape[1]), jnp.int32),
                     gt_valid=jnp.asarray(valids[sel]),
                     img_shape=jnp.tile(jnp.asarray([[64, 64]], jnp.int32),
                                        (b, 1)))
        rng, k = jax.random.split(rng)
        state, metrics = train_step(state, batch, k)
        loss = float(metrics["loss"])
        if first_loss is None:
            first_loss = loss
        last_loss = loss
    assert last_loss < first_loss * 0.6, (first_loss, last_loss)

    variables = {"params": state["params"]}
    if state["batch_stats"]:
        variables["batch_stats"] = state["batch_stats"]
    out = model.apply(variables, jnp.asarray(imgs[:b]),
                      jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
                      method=model.simple_test)
    dets = out
    while not hasattr(dets, "bboxes"):
        dets = dets[0]
    db = np.asarray(dets.bboxes)
    dv = np.asarray(dets.valid)
    hits = 0
    for i in range(b):
        if not dv[i].any():
            continue
        top = db[i][dv[i]][0]
        gts = boxes[i][valids[i]]
        ious = []
        for g in gts:
            ix1, iy1 = max(top[0], g[0]), max(top[1], g[1])
            ix2, iy2 = min(top[2], g[2]), min(top[3], g[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            a1 = (top[2] - top[0]) * (top[3] - top[1])
            a2 = (g[2] - g[0]) * (g[3] - g[1])
            ious.append(inter / max(a1 + a2 - inter, 1e-6))
        hits += max(ious) > 0.3
    assert hits >= b // 2, f"only {hits}/{b} top detections hit a gt"
