"""HTC (interleaved cascade + semantic fusion + mask info flow) and SCNet
(global context + feature relay)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.models import build_detector


def _batch(with_masks=True, seed=1):
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
_BBOX = dict(type="Shared2FCBBoxHead", num_classes=2, in_channels=16,
             fc_out_channels=32, roi_feat_size=7,
             bbox_coder=dict(target_means=[0, 0, 0, 0],
                             target_stds=[0.1, 0.1, 0.2, 0.2]))
_TRAIN = dict(
    rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                           neg_iou_thr=0.3, min_pos_iou=0.3,
                           match_low_quality=True),
             sampler=dict(type="RandomSampler", num=64, pos_fraction=0.5)),
    rpn_proposal=dict(nms_pre=100, max_per_img=32,
                      nms=dict(iou_threshold=0.7), min_bbox_size=0),
    rcnn=[dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=t,
                             neg_iou_thr=t, min_pos_iou=t),
               sampler=dict(type="RandomSampler", num=32, pos_fraction=0.25))
          for t in (0.5, 0.6)])
_TEST = dict(rpn=dict(nms_pre=100, max_per_img=32,
                      nms=dict(iou_threshold=0.7), min_bbox_size=0),
             rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                       max_per_img=8))


def _drive(model, with_masks=True, mask_pair=True):
    batch = _batch(with_masks)
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
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
    assert np.isfinite(float(total))
    gn = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.asarray(x, jnp.float32) ** 2)),
        grads["params"], 0.0)
    assert np.isfinite(gn) and gn > 0
    out, _ = model.apply(variables, img, batch["img_shape"],
                         method=model.simple_test)
    if mask_pair:
        dets, seg = out
        assert seg.shape[:2] == (2, 8)
        assert float(jnp.min(seg)) >= 0 and float(jnp.max(seg)) <= 1
    return losses


@pytest.mark.slow
def test_htc_forward_backward():
    model = build_detector(
        dict(type="HybridTaskCascade",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0, num_outs=5),
             rpn_head=dict(_RPN,
                           anchor_generator=dict(type="AnchorGenerator",
                                                 scales=[2],
                                                 ratios=[0.5, 1.0, 2.0],
                                                 strides=[4, 8, 16, 32, 64])),
             roi_head=dict(
                 type="HybridTaskCascadeRoIHead", num_stages=2,
                 stage_loss_weights=[1.0, 0.5],
                 bbox_roi_extractor=_EXTRACT,
                 bbox_head=[_BBOX, _BBOX],
                 mask_head=dict(type="HTCMaskHead", num_convs=1,
                                in_channels=16, conv_out_channels=16,
                                num_classes=2),
                 semantic_head=dict(type="FusedSemanticHead", num_ins=5,
                                    fusion_level=1, num_convs=2,
                                    in_channels=16, conv_out_channels=16,
                                    num_classes=3),
                 semantic_roi_extractor=dict(out_channels=16,
                                             featmap_strides=[8]),
                 interleaved=True, mask_info_flow=True)),
        _TRAIN, _TEST)
    losses = _drive(model)
    for k in ("loss_semantic_seg", "loss_s0_cls", "loss_s1_cls",
              "loss_s0_mask", "loss_s1_mask"):
        assert k in losses, sorted(losses)


@pytest.mark.slow
def test_scnet_forward_backward():
    model = build_detector(
        dict(type="SCNet",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0, num_outs=4),
             rpn_head=_RPN,
             roi_head=dict(
                 type="SCNetRoIHead", num_stages=2,
                 stage_loss_weights=[1.0, 0.5],
                 bbox_roi_extractor=_EXTRACT,
                 bbox_head=[_BBOX, _BBOX],
                 mask_head=dict(type="HTCMaskHead", num_convs=1,
                                in_channels=16, conv_out_channels=16,
                                num_classes=2),
                 semantic_head=dict(type="FusedSemanticHead", num_ins=4,
                                    fusion_level=1, num_convs=2,
                                    in_channels=16, conv_out_channels=16,
                                    num_classes=3),
                 semantic_roi_extractor=dict(out_channels=16,
                                             featmap_strides=[8]),
                 glbctx_head=dict(type="GlobalContextHead", num_convs=1,
                                  in_channels=16, conv_out_channels=16,
                                  loss_weight=3.0),
                 feat_relay_head=dict(type="FeatureRelayHead"))),
        _TRAIN, _TEST)
    losses = _drive(model)
    for k in ("loss_semantic_seg", "loss_glbctx", "loss_s0_cls",
              "loss_s1_cls", "loss_mask"):
        assert k in losses, sorted(losses)


def test_htc_mask_head_info_flow():
    """conv_res path: with a residual input the logits must differ."""
    from pointtinybenchmark_tpu.models import HTCMaskHead
    head = HTCMaskHead(num_convs=1, in_channels=8, conv_out_channels=8,
                       num_classes=2)
    x = jnp.asarray(np.random.RandomState(0).rand(3, 7, 7, 8), jnp.float32)
    res = jnp.asarray(np.random.RandomState(1).rand(3, 7, 7, 8), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), x, res)
    logits, feat = head.apply(params, x, res)
    assert logits.shape == (3, 14, 14, 2) and feat.shape == (3, 7, 7, 8)
    only_feat = head.apply(params, x, res, return_logits=False)
    np.testing.assert_allclose(np.asarray(only_feat), np.asarray(feat))


def test_fused_semantic_head_shapes():
    from pointtinybenchmark_tpu.models import FusedSemanticHead
    head = FusedSemanticHead(num_ins=4, fusion_level=1, num_convs=1,
                             in_channels=8, conv_out_channels=8,
                             num_classes=5)
    feats = [jnp.ones((2, 16 // (2 ** i), 16 // (2 ** i), 8))
             for i in range(4)]
    params = head.init(jax.random.PRNGKey(0), feats)
    logits, embed = head.apply(params, feats)
    assert logits.shape == (2, 8, 8, 5)
    assert embed.shape == (2, 8, 8, 8)
