"""DetectoRS (SAC + RFP) and other round-1b zoo additions."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.models import build_detector


def _demo_batch(b=2, g=5, num_classes=2, seed=1):
    rng = np.random.RandomState(seed)
    bb = rng.rand(b, g, 4).astype(np.float32) * 30
    bb[..., 2:] = bb[..., :2] + 6 + rng.rand(b, g, 2).astype(np.float32) * 20
    return dict(gt_bboxes=jnp.asarray(bb),
                gt_labels=jnp.asarray(rng.randint(0, num_classes, (b, g)),
                                      jnp.int32),
                gt_valid=jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 0, 0, 0]], bool),
                img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32))


def test_saconv_starts_as_plain_conv():
    """Switch inits to 1 -> output equals the dilation-1 branch at init."""
    from pointtinybenchmark_tpu.models import SAConv2d
    mod = SAConv2d(8, 8)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 10, 10, 8), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == (1, 10, 10, 8)
    # with switch==sigmoid? no: switch conv w=0,b=1 -> switch=1 exactly
    # so out == conv(x, AWS(w)) + 0 post-context; compare vs manual
    w = params["params"]["weight"]
    mean = w.mean((0, 1, 2), keepdims=True)
    std = w.std((0, 1, 2), keepdims=True) + 1e-5
    he_std = np.sqrt(2.0 / (3 * 3 * 8))
    ws = he_std * (w - mean) / std
    dn = jax.lax.conv_dimension_numbers(x.shape, ws.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(x, ws, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=dn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_detectors_resnet_rfp_shapes():
    from pointtinybenchmark_tpu.models import DetectoRS_ResNet
    bb = DetectoRS_ResNet(depth=50, base_channels=8, output_img=True,
                          sac=dict(type="SAC"),
                          stage_with_sac=(False, True, True, True),
                          rfp_inplanes=16)
    img = jnp.ones((1, 64, 64, 3))
    params = bb.init(jax.random.PRNGKey(0), img)
    outs = bb.apply(params, img)
    assert outs[0].shape == (1, 64, 64, 3)          # raw image first
    assert [o.shape[-1] for o in outs[1:]] == [32, 64, 128, 256]
    # feedback pass: rfp_feats for stages 1..3
    rfp_feats = [None,
                 jnp.ones((1, 8, 8, 16)), jnp.ones((1, 4, 4, 16)),
                 jnp.ones((1, 2, 2, 16))]
    bb2 = DetectoRS_ResNet(depth=50, base_channels=8, output_img=False,
                           rfp_inplanes=16)
    p2 = bb2.init(jax.random.PRNGKey(0), img, rfp_feats=rfp_feats)
    outs2 = bb2.apply(p2, img, rfp_feats=rfp_feats)
    assert len(outs2) == 4
    # rfp_conv is zero-init -> feedback is identity at init
    outs2b = bb2.apply(p2, img, rfp_feats=[None,
                       jnp.zeros((1, 8, 8, 16)), jnp.zeros((1, 4, 4, 16)),
                       jnp.zeros((1, 2, 2, 16))])
    np.testing.assert_allclose(np.asarray(outs2[1]), np.asarray(outs2b[1]),
                               atol=1e-6)


def test_detectors_cascade_rcnn_forward_backward():
    """DetectoRS = Cascade R-CNN + DetectoRS_ResNet(SAC) + RFP neck."""
    bb_cfg = dict(depth=50, base_channels=8, sac=dict(type="SAC"),
                  stage_with_sac=(False, True, True, True))
    model = build_detector(
        dict(type="FasterRCNN",
             backbone=dict(type="DetectoRS_ResNet", output_img=True,
                           **bb_cfg),
             neck=dict(type="RFP", in_channels=[32, 64, 128, 256],
                       out_channels=16, num_outs=5, rfp_steps=2,
                       aspp_out_channels=4,
                       rfp_backbone=bb_cfg),
             rpn_head=dict(
                 type="RPNHead", num_classes=1, in_channels=16,
                 feat_channels=16,
                 anchor_generator=dict(type="AnchorGenerator", scales=[2],
                                       ratios=[0.5, 1.0, 2.0],
                                       strides=[4, 8, 16, 32, 64]),
                 loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True),
                 loss_bbox=dict(type="L1Loss")),
             roi_head=dict(
                 type="StandardRoIHead",
                 bbox_roi_extractor=dict(
                     roi_layer=dict(type="RoIAlign", output_size=7,
                                    sampling_ratio=0),
                     out_channels=16, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(
                     type="Shared2FCBBoxHead", num_classes=2, in_channels=16,
                     fc_out_channels=32, roi_feat_size=7,
                     bbox_coder=dict(target_stds=[0.1, 0.1, 0.2, 0.2]),
                     loss_cls=dict(type="CrossEntropyLoss"),
                     loss_bbox=dict(type="L1Loss")))),
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
                       pos_weight=-1)),
        dict(rpn=dict(nms_pre=100, max_per_img=50,
                      nms=dict(iou_threshold=0.7)),
             rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                       max_per_img=20)))
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    batch = _demo_batch()
    variables = model.init(jax.random.PRNGKey(0), img)
    rngs = {"sampler": jax.random.PRNGKey(3)}
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"], rngs=rngs)
    for k, v in losses.items():
        if k.startswith("loss"):
            assert np.isfinite(float(v)), (k, float(v))

    def total(v):
        l, _ = model.apply(v, img, batch, method=model.forward_train,
                           mutable=["batch_stats"], rngs=rngs)
        return sum(x for k, x in l.items() if k.startswith("loss"))

    g = jax.grad(total)(variables)
    # SAC switch and weight_diff must be reachable
    bbp = g["params"]["backbone_m"]
    sac_g = bbp["layer2_block0"]["conv2_sac"]["weight_diff"]
    assert sac_g.shape == (3, 3, 16, 16)
    rfp_g = g["params"]["neck_m"]["rfp_backbone0"]["layer2_block0"]["rfp_conv"]["kernel"]
    assert float(jnp.abs(rfp_g).sum()) > 0


def _dynamic_frcnn():
    return build_detector(
        dict(type="FasterRCNN",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0, num_outs=5),
             rpn_head=dict(
                 type="RPNHead", num_classes=1, in_channels=16,
                 feat_channels=16,
                 anchor_generator=dict(type="AnchorGenerator", scales=[2],
                                       ratios=[0.5, 1.0, 2.0],
                                       strides=[4, 8, 16, 32, 64]),
                 loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True),
                 loss_bbox=dict(type="L1Loss")),
             roi_head=dict(
                 type="DynamicRoIHead",
                 bbox_roi_extractor=dict(
                     roi_layer=dict(type="RoIAlign", output_size=7,
                                    sampling_ratio=0),
                     out_channels=16, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(
                     type="Shared2FCBBoxHead", num_classes=2, in_channels=16,
                     fc_out_channels=32, roi_feat_size=7,
                     bbox_coder=dict(target_stds=[0.1, 0.1, 0.2, 0.2]),
                     loss_cls=dict(type="CrossEntropyLoss"),
                     loss_bbox=dict(type="SmoothL1Loss", beta=1.0)))),
        dict(rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                    neg_iou_thr=0.3, min_pos_iou=0.3),
                      sampler=dict(type="RandomSampler", num=64,
                                   pos_fraction=0.5),
                      allowed_border=-1, pos_weight=-1),
             rpn_proposal=dict(nms_pre=100, max_per_img=50,
                               nms=dict(iou_threshold=0.7)),
             rcnn=dict(assigner=dict(type="MaxIoUAssigner",
                                     match_low_quality=False),
                       sampler=dict(type="RandomSampler", num=32,
                                    pos_fraction=0.25,
                                    add_gt_as_proposals=True),
                       dynamic_rcnn=dict(iou_topk=8, beta_topk=2,
                                         update_iter_interval=2,
                                         initial_iou=0.4, initial_beta=1.0),
                       pos_weight=-1)),
        dict(rpn=dict(nms_pre=100, max_per_img=50,
                      nms=dict(iou_threshold=0.7)),
             rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                       max_per_img=20)))


def test_dynamic_roi_head_adapts():
    model = _dynamic_frcnn()
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    batch = _demo_batch()
    variables = model.init(jax.random.PRNGKey(0), img)
    rngs = {"sampler": jax.random.PRNGKey(3)}
    bs = variables["batch_stats"]
    thr_key = [k for k in jax.tree_util.tree_leaves_with_path(bs)
               ]  # noqa: F841 — structural presence checked below
    flat = jax.tree_util.tree_flatten_with_path(bs)[0]
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert any("dynamic_iou_thr" in n for n in names)

    # run 2 steps (update_iter_interval=2) and check thresholds moved
    state = variables
    losses = None
    for _ in range(2):
        losses, mut = model.apply(state, img, batch,
                                  method=model.forward_train,
                                  mutable=["batch_stats"], rngs=rngs)
        state = {"params": state["params"], **mut}
    assert np.isfinite(float(losses["loss_bbox"]))
    thr0 = 0.4
    roi = state["batch_stats"]["roi_head_m"]
    new_thr = float(roi["dynamic_iou_thr"])
    step = int(roi["dynamic_step"])
    assert step == 2
    assert new_thr >= thr0  # max(initial_iou, mean history)
    assert 0.0 < float(roi["dynamic_beta"]) <= 1.0


def test_legacy_v1x_faster_rcnn_runs():
    """MMDet V1.x compat surface (configs/legacy_1x): LegacyAnchorGenerator
    + LegacyDeltaXYWHBBoxCoder + RoIAlign aligned=False train/test e2e."""
    model = build_detector(
        dict(type="FasterRCNN",
             backbone=dict(type="ResNet", depth=18, base_channels=8,
                           num_stages=4, out_indices=(0, 1, 2, 3)),
             neck=dict(type="FPN", in_channels=[16, 32, 64, 128],
                       out_channels=16, num_outs=5),
             rpn_head=dict(
                 type="RPNHead", num_classes=1, in_channels=16,
                 feat_channels=16,
                 anchor_generator=dict(type="LegacyAnchorGenerator",
                                       center_offset=0.5, scales=[8],
                                       ratios=[0.5, 1.0, 2.0],
                                       strides=[4, 8, 16, 32, 64]),
                 bbox_coder=dict(type="LegacyDeltaXYWHBBoxCoder",
                                 target_means=[0, 0, 0, 0],
                                 target_stds=[1, 1, 1, 1]),
                 loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True),
                 loss_bbox=dict(type="SmoothL1Loss", beta=1.0 / 9.0)),
             roi_head=dict(
                 type="StandardRoIHead",
                 bbox_roi_extractor=dict(
                     roi_layer=dict(type="RoIAlign", output_size=7,
                                    sampling_ratio=2, aligned=False),
                     out_channels=16, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(
                     type="Shared2FCBBoxHead", num_classes=2, in_channels=16,
                     fc_out_channels=32, roi_feat_size=7,
                     bbox_coder=dict(type="LegacyDeltaXYWHBBoxCoder",
                                     target_means=[0, 0, 0, 0],
                                     target_stds=[0.1, 0.1, 0.2, 0.2]),
                     loss_cls=dict(type="CrossEntropyLoss"),
                     loss_bbox=dict(type="SmoothL1Loss", beta=1.0)))),
        dict(rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                    neg_iou_thr=0.3, min_pos_iou=0.3,
                                    match_low_quality=True),
                      sampler=dict(type="RandomSampler", num=64,
                                   pos_fraction=0.5),
                      allowed_border=-1, pos_weight=-1),
             rpn_proposal=dict(nms_pre=100, max_per_img=50,
                               nms=dict(iou_threshold=0.7)),
             rcnn=dict(sampler=dict(type="RandomSampler", num=32,
                                    pos_fraction=0.25))),
        dict(rpn=dict(nms_pre=100, max_per_img=50,
                      nms=dict(iou_threshold=0.7)),
             rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                       max_per_img=10)))
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                      jnp.float32)
    batch = _demo_batch()
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"],
                            rngs={"sampler": jax.random.PRNGKey(3)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    dets = model.apply(variables, img, batch["img_shape"], None, False,
                       method=model.simple_test)
    while not hasattr(dets, "bboxes"):
        dets = dets[0]
    assert np.isfinite(np.asarray(dets.bboxes)).all()


def test_detectors_resnext_backbone():
    """DetectoRS_ResNeXt (reference backbones/detectors_resnext.py:98):
    grouped SAC bottlenecks at ResNeXt width (32x4d -> width 128 at
    layer1), RFP feedback input preserved."""
    import jax
    import jax.numpy as jnp

    from pointtinybenchmark_tpu.models import build_backbone

    bb = build_backbone(dict(
        type="DetectoRS_ResNeXt", depth=50, groups=32, base_width=4,
        base_channels=64, sac=dict(type="SAC"),
        stage_with_sac=(False, True, True, True)))
    x = jnp.zeros((1, 64, 64, 3))
    v = bb.init(jax.random.PRNGKey(0), x, train=False)
    outs = bb.apply(v, x, train=False)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    # ResNeXt 32x4d width: conv1 of layer1 projects to 4*32=128 channels
    assert v["params"]["layer1_block0"]["conv1"]["kernel"].shape[-1] == 128
    # grouped SAC kernel: (3, 3, width/groups, width)
    k = v["params"]["layer2_block0"]["conv2_sac"]["weight"]
    assert k.shape == (3, 3, 256 // 32, 256)
