"""CentripetalNet — corner pairing by centripetal shifts."""
import numpy as np

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.models import build_detector


def test_centripetalnet_forward_backward():
    model = build_detector(dict(
        type="CentripetalNet",
        backbone=dict(type="HourglassNet", downsample_times=3, num_stacks=2,
                      stage_channels=(8, 8, 12, 16),
                      stage_blocks=(1, 1, 1, 1), feat_channel=8),
        bbox_head=dict(type="CentripetalHead", num_classes=2, in_channels=8,
                       feat_channels=8, stride=4)),
        None, dict(corner_topk=16, max_per_img=10, score_thr=0.05))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    bb = rng.rand(2, 4, 4).astype(np.float32) * 20
    bb[..., 2:] = bb[..., :2] + 12 + rng.rand(2, 4, 2).astype(np.float32) * 25
    batch = dict(gt_bboxes=jnp.asarray(bb),
                 gt_labels=jnp.asarray(rng.randint(0, 2, (2, 4)), jnp.int32),
                 gt_valid=jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], bool),
                 img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), img)

    def loss_fn(v):
        losses, _ = model.apply(v, img, batch, method=model.forward_train,
                                mutable=["batch_stats"])
        return sum(jnp.sum(x) for k, x in losses.items()
                   if k.startswith("loss")), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables)
    assert np.isfinite(float(total))
    assert {"loss_heatmap", "loss_offset", "loss_guiding_shift",
            "loss_centripetal_shift"} <= set(losses)
    assert float(losses["num_pos"]) == 5.0
    gn = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.asarray(x, jnp.float32) ** 2)),
        grads["params"], 0.0)
    assert np.isfinite(gn) and gn > 0
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 10, 5)


def test_centripetal_gate_geometry():
    """A tl/br pair whose shifted centers agree must outrank one that
    doesn't: drive get_bboxes with hand-built outputs."""
    from pointtinybenchmark_tpu.models import CentripetalHead
    head = CentripetalHead(num_classes=1, in_channels=8, feat_channels=8,
                           stride=4,
                           test_cfg=dict(corner_topk=4, max_per_img=4,
                                         score_thr=0.1))
    h = w = 16
    # box (8, 8) -> (40, 40) in image pixels = (2, 2) -> (10, 10) on the map
    tl_hm = np.full((1, h, w, 1), -8.0, np.float32)
    br_hm = np.full((1, h, w, 1), -8.0, np.float32)
    tl_hm[0, 2, 2, 0] = 6.0
    br_hm[0, 10, 10, 0] = 6.0
    zero_off = np.zeros((1, h, w, 2), np.float32)
    # correct centripetal shift: center at (24, 24) image px -> shift 16px
    # = 4 feature units -> log(4)
    good = np.full((1, h, w, 2), np.log(4.0), np.float32)
    bad = np.full((1, h, w, 2), np.log(0.25), np.float32)
    img_shapes = jnp.asarray([[64, 64]], jnp.int32)

    dets_good, _ = head.get_bboxes(
        (jnp.asarray(tl_hm), jnp.asarray(zero_off), None, jnp.asarray(good)),
        (jnp.asarray(br_hm), jnp.asarray(zero_off), None, jnp.asarray(good)),
        img_shapes, (64, 64))
    dets_bad, _ = head.get_bboxes(
        (jnp.asarray(tl_hm), jnp.asarray(zero_off), None, jnp.asarray(bad)),
        (jnp.asarray(br_hm), jnp.asarray(zero_off), None, jnp.asarray(bad)),
        img_shapes, (64, 64))
    assert float(dets_good.bboxes[0, 0, 4]) > 0.5
    # bad shifts point near the corners -> outside the central region
    assert float(dets_bad.bboxes[0, 0, 4]) == 0.0
    np.testing.assert_allclose(np.asarray(dets_good.bboxes[0, 0, :4]),
                               [8, 8, 40, 40], atol=1.0)
