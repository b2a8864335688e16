"""Multi-chip sharding as a CI test (VERDICT r1 item 10): the dp and dp x tp
training steps on a virtual 8-device CPU mesh must produce the same loss as
the single-device step on the identical global batch.

conftest.py forces JAX_PLATFORMS=cpu with xla_force_host_platform_device_count=8,
so jax.devices() has 8 virtual devices inside pytest.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax


@pytest.fixture(scope="module")
def setup():
    from __graft_entry__ import _flagship
    from pointtinybenchmark_tpu.engine.train import (init_model,
                                                     make_train_step)

    model = _flagship(tiny=True)
    b = 8
    rng = np.random.RandomState(0)
    batch = dict(
        img=jnp.asarray(rng.rand(b, 64, 64, 3), jnp.float32),
        gt_bboxes=jnp.asarray(rng.rand(b, 5, 4) * 50, jnp.float32),
        gt_labels=jnp.zeros((b, 5), jnp.int32),
        gt_valid=jnp.asarray(np.tile([1, 1, 1, 0, 0], (b, 1)), bool),
        img_shape=jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
    )
    params, batch_stats = init_model(model, batch)
    tx = optax.adam(1e-3)

    def fresh_state():
        # copy everything: the train step donates its state buffers
        return dict(params=jax.tree_util.tree_map(jnp.copy, params),
                    batch_stats=jax.tree_util.tree_map(jnp.copy,
                                                       batch_stats),
                    opt_state=tx.init(params), step=jnp.int32(0))

    step = make_train_step(model, tx)
    # single-device reference step
    state0, metrics0 = step(fresh_state(), batch, jax.random.PRNGKey(1))
    return dict(model=model, batch=batch, fresh_state=fresh_state,
                step=step, loss0=float(metrics0["loss"]),
                params1=jax.device_get(state0["params"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_step_matches_single_device(setup):
    from pointtinybenchmark_tpu.parallel import (make_mesh, replicate,
                                                 shard_batch)
    mesh = make_mesh(num_data=8, num_model=1, devices=jax.devices()[:8])
    state = replicate(setup["fresh_state"](), mesh)
    batch = shard_batch(setup["batch"], mesh)
    state, metrics = setup["step"](state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    np.testing.assert_allclose(loss, setup["loss0"], rtol=1e-5)
    # updated params agree with the single-device update too
    p_dp = jax.device_get(state["params"])
    flat_dp = jax.tree_util.tree_leaves(p_dp)
    flat_1 = jax.tree_util.tree_leaves(setup["params1"])
    for a, b in zip(flat_dp, flat_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_tp_step_matches_single_device(setup):
    from pointtinybenchmark_tpu.parallel import (make_mesh, replicate,
                                                 shard_batch,
                                                 shard_params_model_axis)
    mesh = make_mesh(num_data=4, num_model=2, devices=jax.devices()[:8])
    st = setup["fresh_state"]()
    st["params"] = shard_params_model_axis(st["params"], mesh)
    st["batch_stats"] = replicate(st["batch_stats"], mesh)
    st["opt_state"] = optax.adam(1e-3).init(st["params"])
    batch = shard_batch(setup["batch"], mesh)
    state, metrics = setup["step"](st, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    np.testing.assert_allclose(loss, setup["loss0"], rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_two_stage_step(tmp_path):
    """Data-parallel train step for the TWO-STAGE protocol model (RPN +
    RoI head with in-graph assignment/sampling): loss on the 8-way dp
    mesh equals the single-device loss on the same global batch — the
    sampler rng and gather-heavy RoI stage must be shard-invariant."""
    from pointtinybenchmark_tpu.engine.train import (init_model,
                                                     make_train_step)
    from pointtinybenchmark_tpu.models import build_detector
    from pointtinybenchmark_tpu.parallel import (make_mesh, replicate,
                                                 shard_batch)

    model = build_detector(
        dict(type="FasterRCNN",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=8, num_outs=5),
             rpn_head=dict(
                 type="RPNHead", num_classes=1, in_channels=8,
                 feat_channels=8,
                 anchor_generator=dict(type="AnchorGenerator", scales=[2],
                                       ratios=[1.0],
                                       strides=[4, 8, 16, 32, 64]),
                 bbox_coder=dict(target_means=[0, 0, 0, 0],
                                 target_stds=[1, 1, 1, 1]),
                 loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True),
                 loss_bbox=dict(type="L1Loss")),
             roi_head=dict(
                 type="StandardRoIHead",
                 bbox_roi_extractor=dict(
                     roi_layer=dict(type="RoIAlign", output_size=7,
                                    sampling_ratio=1),
                     out_channels=8, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(type="Shared2FCBBoxHead", num_classes=1,
                                in_channels=8, fc_out_channels=16,
                                roi_feat_size=7))),
        dict(rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                    neg_iou_thr=0.3, min_pos_iou=0.3),
                      sampler=dict(type="RandomSampler", num=16,
                                   pos_fraction=0.5), pos_weight=-1),
             rpn_proposal=dict(nms_pre=32, max_per_img=16,
                               nms=dict(iou_threshold=0.7), min_bbox_size=0),
             rcnn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                     neg_iou_thr=0.5, min_pos_iou=0.5),
                       sampler=dict(type="RandomSampler", num=16,
                                    pos_fraction=0.25,
                                    add_gt_as_proposals=True),
                       pos_weight=-1)),
        dict(rpn=dict(nms_pre=32, max_per_img=16,
                      nms=dict(iou_threshold=0.7), min_bbox_size=0),
             rcnn=dict(score_thr=0.1, nms=dict(iou_threshold=0.5),
                       max_per_img=5)))
    b = 8
    rng = np.random.RandomState(1)
    boxes = np.zeros((b, 3, 4), np.float32)
    boxes[..., :2] = rng.rand(b, 3, 2) * 30
    boxes[..., 2:] = boxes[..., :2] + rng.rand(b, 3, 2) * 15 + 5
    batch = dict(
        img=jnp.asarray(rng.rand(b, 64, 64, 3), jnp.float32),
        gt_bboxes=jnp.asarray(boxes),
        gt_labels=jnp.zeros((b, 3), jnp.int32),
        gt_valid=jnp.ones((b, 3), bool),
        img_shape=jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
    )
    params, batch_stats = init_model(model, batch)
    tx = optax.sgd(1e-3)

    def fresh():
        return dict(params=jax.tree_util.tree_map(jnp.copy, params),
                    batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
                    opt_state=tx.init(params), step=jnp.int32(0))

    step = make_train_step(model, tx)
    _, m0 = step(fresh(), batch, jax.random.PRNGKey(3))
    loss0 = float(m0["loss"])

    mesh = make_mesh(num_data=8, num_model=1, devices=jax.devices()[:8])
    state = replicate(fresh(), mesh)
    sbatch = shard_batch(batch, mesh)
    _, m = step(state, sbatch, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))
    np.testing.assert_allclose(float(m["loss"]), loss0, rtol=1e-5)


# ---------------------------------------------------------------------------
# Round 4 (VERDICT r3 #6): EVAL-side multi-chip — tiled inference sharded
# over the data axis + the on-device global merge must produce detections
# identical to the single-device run (reference role: multi_gpu_test +
# result collection, mmdet/apis/test.py:69-160).
# ---------------------------------------------------------------------------

@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tiled_inference_and_merge_match_single_device():
    from pointtinybenchmark_tpu.models import build_detector
    from pointtinybenchmark_tpu.ops.nms import batched_nms_large
    from pointtinybenchmark_tpu.parallel import make_mesh, replicate, \
        shard_batch

    model = build_detector(
        dict(type="SingleStageDetector",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0,
                       add_extra_convs="on_input", num_outs=5),
             bbox_head=dict(
                 type="RetinaHead", num_classes=2, in_channels=16,
                 feat_channels=16, stacked_convs=1,
                 anchor_generator=dict(type="AnchorGenerator",
                                       octave_base_scale=2,
                                       scales_per_octave=3,
                                       ratios=[0.5, 1.0, 2.0],
                                       strides=[4, 8, 16, 32, 64]),
                 bbox_coder=dict(target_means=[0, 0, 0, 0],
                                 target_stds=[1, 1, 1, 1]),
                 loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                               gamma=2.0, alpha=0.25, loss_weight=1.0),
                 loss_bbox=dict(type="L1Loss", loss_weight=1.0))),
        None,
        dict(nms_pre=200, score_thr=0.02,
             nms=dict(type="nms", iou_threshold=0.5), max_per_img=50))

    # 2 images x 4 tiles = 8 tiles, one per virtual device
    n_img, v = 2, 4
    b = n_img * v
    rng = np.random.RandomState(0)
    tiles = jnp.asarray(rng.rand(b, 64, 64, 3), jnp.float32)
    img_shape = jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1))
    offs = np.asarray([[0, 0], [48, 0], [0, 40], [48, 40]], np.float32)
    shift = jnp.asarray(np.tile(np.concatenate([offs, offs], 1),
                                (n_img, 1)))[:, None, :]      # (B, 1, 4)
    variables = model.init(jax.random.PRNGKey(0), tiles[:1], train=False)

    def infer(tiles, img_shape):
        out = model.apply(variables, tiles, img_shape, None, False,
                          method=model.simple_test)
        dets = out
        while not hasattr(dets, "bboxes"):
            dets = dets[0]
        boxes = dets.bboxes[..., :4] + shift
        scores = dets.bboxes[..., 4]
        m = boxes.shape[1]
        bi = boxes.reshape(n_img, v * m, 4)
        si = scores.reshape(n_img, v * m)
        li = dets.labels.reshape(n_img, v * m)
        vi = dets.valid.reshape(n_img, v * m)
        outs = [batched_nms_large(bi[i], si[i], li[i], 0.5, 100,
                                  valid_mask=vi[i]) for i in range(n_img)]
        return (jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]),
                bi, si, li)

    # single-device reference
    keep0, num0, b0, s0, l0 = jax.jit(infer)(tiles, img_shape)

    # 8-way dp: tiles sharded over the data axis, params replicated; the
    # per-image merge gathers tile dets across devices (XLA collectives)
    mesh = make_mesh(num_data=8, num_model=1, devices=jax.devices()[:8])
    variables = replicate(variables, mesh)
    sharded = shard_batch(dict(img=tiles, img_shape=img_shape), mesh)
    keep1, num1, b1, s1, l1 = jax.jit(infer)(sharded["img"],
                                             sharded["img_shape"])

    np.testing.assert_array_equal(np.asarray(num0), np.asarray(num1))
    np.testing.assert_allclose(np.asarray(b0), np.asarray(b1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-6)
    k0, k1 = np.asarray(keep0), np.asarray(keep1)
    np.testing.assert_array_equal(k0, k1)
    # merged detections decoded from keep indices agree exactly
    for i in range(n_img):
        sel0 = k0[i][k0[i] >= 0]
        sel1 = k1[i][k1[i] >= 0]
        np.testing.assert_allclose(np.asarray(b0)[i][sel0],
                                   np.asarray(b1)[i][sel1], atol=1e-5)
        np.testing.assert_array_equal(np.asarray(l0)[i][sel0],
                                      np.asarray(l1)[i][sel1])
