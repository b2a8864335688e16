"""DeformConv2d op + ResNet dcn/ContextBlock plugins."""
import numpy as np

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.ops.dcn import DeformConv2d


def test_deform_conv_equals_plain_conv_at_init():
    """Zero-init offsets -> DeformConv == dense 3x3 conv with the same
    weight (the taps fall exactly on the kernel grid)."""
    m = DeformConv2d(8, kernel_size=3, stride=1)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 10, 12, 4), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 10, 12, 8)
    # manual: taps = im2col with zero padding; dense contraction
    w = np.asarray(v["params"]["weight"]["kernel"])   # (9*4, 8)
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = np.zeros((1, 10, 12, 9, 4), np.float32)
    for ky in range(3):
        for kx in range(3):
            cols[0, :, :, ky * 3 + kx] = xp[0, ky:ky + 10, kx:kx + 12]
    want = cols.reshape(1, 10, 12, 36) @ w
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4, rtol=1e-4)


def test_deform_conv_stride_and_modulated():
    m = DeformConv2d(6, kernel_size=3, stride=2, modulated=True)
    x = jnp.ones((2, 16, 16, 4))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 8, 8, 6)
    # modulation logits exist (3*k*k offset channels)
    assert v["params"]["offset_conv"]["kernel"].shape[-1] == 27


def test_resnet_dcn_and_gcb():
    from pointtinybenchmark_tpu.models import ResNet
    m = ResNet(depth=50, base_channels=8, dcn=dict(type="DCNv2"),
               stage_with_dcn=(False, True, True, True),
               plugins=[dict(cfg=dict(type="ContextBlock", ratio=0.25),
                             stages=(False, True, True, True))])
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    flat = [jax.tree_util.keystr(k) for k, _ in
            jax.tree_util.tree_leaves_with_path(v["params"])]
    assert any("dcn_conv2" in s for s in flat)
    assert any("gcb" in s for s in flat)
    assert not any("layer1" in s and "dcn" in s for s in flat)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [32, 64, 128, 256]

    def loss(p):
        return sum(jnp.sum(o ** 2) for o in m.apply(
            {**v, "params": p}, x))
    g = jax.grad(loss)(v["params"])
    gn = jax.tree_util.tree_reduce(lambda a, t: a + float(jnp.sum(t * t)),
                                   g, 0.0)
    assert np.isfinite(gn) and gn > 0


def test_resnet_generalized_attention():
    from pointtinybenchmark_tpu.models import ResNet
    m = ResNet(depth=18, base_channels=8,
               plugins=[dict(cfg=dict(type="GeneralizedAttention",
                                      num_heads=4, kv_stride=2),
                             stages=(False, False, True, True))])
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    flat = [jax.tree_util.keystr(k) for k, _ in
            jax.tree_util.tree_leaves_with_path(v["params"])]
    assert any("attn3" in s for s in flat) and any("attn4" in s
                                                  for s in flat)
    assert not any("attn1" in s for s in flat)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [8, 16, 32, 64]
    # zero-init proj -> identity at init
    m0 = ResNet(depth=18, base_channels=8)
    v0 = m0.init(jax.random.PRNGKey(0), x)
    outs0 = m0.apply(v0, x)
    np.testing.assert_allclose(np.asarray(outs[3]), np.asarray(outs0[3]),
                               atol=1e-5)


def test_fast_rcnn_precomputed_proposals():
    from pointtinybenchmark_tpu.models import build_detector
    model = build_detector(
        dict(type="FastRCNN",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0, num_outs=4),
             roi_head=dict(
                 type="StandardRoIHead",
                 bbox_roi_extractor=dict(
                     type="GenericRoIExtractor", aggregation="sum",
                     roi_layer=dict(type="RoIAlign", output_size=7,
                                    sampling_ratio=0),
                     out_channels=16, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(type="Shared2FCBBoxHead", num_classes=2,
                                in_channels=16, fc_out_channels=32,
                                roi_feat_size=7))),
        dict(rcnn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                     neg_iou_thr=0.5, min_pos_iou=0.5),
                       sampler=dict(type="RandomSampler", num=32,
                                    pos_fraction=0.25))),
        dict(rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                       max_per_img=8)))
    rng = np.random.RandomState(1)
    bb = rng.rand(2, 5, 4).astype(np.float32) * 30
    bb[..., 2:] = bb[..., :2] + 8 + rng.rand(2, 5, 2).astype(np.float32) * 20
    props = rng.rand(2, 20, 4).astype(np.float32) * 30
    props[..., 2:] = props[..., :2] + 6 \
        + rng.rand(2, 20, 2).astype(np.float32) * 25
    batch = dict(gt_bboxes=jnp.asarray(bb),
                 gt_labels=jnp.asarray(rng.randint(0, 2, (2, 5)), jnp.int32),
                 gt_valid=jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 0, 0, 0]],
                                      bool),
                 proposals=jnp.asarray(props),
                 img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32))
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img,
                           proposals=jnp.asarray(props))
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"],
                            rngs={"sampler": jax.random.PRNGKey(3)})
    assert "loss_cls" in losses and "loss_bbox" in losses
    assert all(np.isfinite(float(v)) for v in losses.values())
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test,
                          proposals=jnp.asarray(props))
    assert dets.bboxes.shape == (2, 8, 5)


def test_resnet_conv_ws():
    from pointtinybenchmark_tpu.models import ResNet
    for depth in (18, 50):
        m = ResNet(depth=depth, base_channels=8, conv_ws=True)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3),
                        jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        flat = [jax.tree_util.keystr(k) for k, _ in
                jax.tree_util.tree_leaves_with_path(v["params"])]
        assert any("WSConv" in s for s in flat), depth
        outs = m.apply(v, x)
        assert all(np.isfinite(np.asarray(o)).all() for o in outs)
    # standardization: effective kernel has ~zero mean per output channel
    from pointtinybenchmark_tpu.models.utils import WSConv
    ws = WSConv(4, (3, 3))
    xx = jnp.ones((1, 8, 8, 2))
    vv = ws.init(jax.random.PRNGKey(1), xx)
    k = np.asarray(vv["params"]["kernel"])
    # raw param is NOT standardized; the forward standardizes. Check via
    # linearity: output of all-ones input == sum of standardized kernel
    out = np.asarray(ws.apply(vv, xx))[0, 4, 4]
    he_std = np.sqrt(2.0 / (3 * 3 * 2))
    ks = he_std * (k - k.mean((0, 1, 2))) / (k.std((0, 1, 2)) + 1e-5)
    np.testing.assert_allclose(out, ks.sum((0, 1, 2)), atol=1e-4)
