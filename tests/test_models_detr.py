import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.models import build_detector


@pytest.fixture(scope="module")
def detr():
    model = build_detector(
        dict(type="DETR",
             backbone=dict(type="ResNet", depth=18, base_channels=8,
                           out_indices=(3,)),
             bbox_head=dict(type="DETRHead", num_classes=3, in_channels=64,
                            num_query=20, embed_dims=32, num_heads=4,
                            num_encoder_layers=2, num_decoder_layers=2,
                            ffn_dim=64)),
        None, dict(max_per_img=20, score_thr=0.0))
    img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    return model, variables, img


def _batch():
    rng = np.random.RandomState(1)
    bb = rng.rand(2, 4, 4).astype(np.float32) * 30
    bb[..., 2:] = bb[..., :2] + 8 + rng.rand(2, 4, 2).astype(np.float32) * 20
    return dict(gt_bboxes=jnp.asarray(bb),
                gt_labels=jnp.asarray(rng.randint(0, 3, (2, 4)), jnp.int32),
                gt_valid=jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], bool),
                img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32))


def test_detr_one_to_one_matching(detr):
    model, variables, img = detr
    losses, _ = model.apply(variables, img, _batch(),
                            method=model.forward_train,
                            mutable=["batch_stats"])
    # exactly one query per valid gt (3 + 2)
    assert float(losses["num_pos"]) == 5.0
    # auxiliary decoder-layer losses present
    assert {"loss_cls", "loss_bbox", "loss_iou",
            "loss_d0.cls", "loss_d0.bbox", "loss_d0.iou"} <= set(losses)
    assert all(np.isfinite(float(v)) for v in losses.values())


def test_detr_gradients_and_inference(detr):
    model, variables, img = detr
    batch = _batch()

    def total(v):
        l, _ = model.apply(v, img, batch, method=model.forward_train,
                           mutable=["batch_stats"])
        return sum(x for k, x in l.items() if k.startswith("loss"))

    g = jax.grad(total)(variables)
    gn = sum(float(jnp.abs(x).sum())
             for x in jax.tree_util.tree_leaves(g["params"]))
    assert np.isfinite(gn) and gn > 0
    # query embeddings receive gradient
    qg = float(jnp.abs(g["params"]["bbox_head_m"]["query_embed"]).sum())
    assert qg > 0

    dets, _ = model.apply(variables, img, jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 20, 5)
    # NMS-free: boxes already normalized-decoded, within image bounds
    db = np.asarray(dets.bboxes)
    assert (db[..., :4] >= -1e-3).all()


def test_deformable_detr():
    from pointtinybenchmark_tpu.models import build_detector
    model = build_detector(dict(
        type="DeformableDETR",
        backbone=dict(type="ResNet", depth=18, base_channels=8,
                      out_indices=(1, 2, 3)),
        neck=dict(type="ChannelMapper", in_channels=[16, 32, 64],
                  out_channels=32, kernel_size=1, num_outs=4),
        bbox_head=dict(type="DeformableDETRHead", num_classes=2,
                       in_channels=32, num_query=20, embed_dims=32,
                       num_heads=4, num_encoder_layers=2,
                       num_decoder_layers=2, ffn_dim=64,
                       num_levels=4, num_points=2)),
        None, dict(max_per_img=10, score_thr=0.0))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    bb = rng.rand(2, 4, 4).astype(np.float32) * 20
    bb[..., 2:] = bb[..., :2] + 10 + rng.rand(2, 4, 2).astype(np.float32) * 25
    batch = dict(gt_bboxes=jnp.asarray(bb),
                 gt_labels=jnp.asarray(rng.randint(0, 2, (2, 4)), jnp.int32),
                 gt_valid=jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], bool),
                 img_shape=jnp.asarray([[64, 64], [60, 62]], jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), img)
    losses, _ = model.apply(variables, img, batch,
                            method=model.forward_train,
                            mutable=["batch_stats"])
    assert all(np.isfinite(float(v)) for v in losses.values())
    # one-to-one auction matches every valid gt exactly once
    assert float(losses["num_pos"]) == 5.0
    # aux losses from the intermediate decoder layer are present
    assert "loss_d0.cls" in losses
    dets, _ = model.apply(variables, img,
                          jnp.asarray([[64, 64], [60, 62]]),
                          method=model.simple_test)
    assert dets.bboxes.shape == (2, 10, 5)


def test_ms_deform_attention_locality():
    """Sampling at the reference point with zero offsets reproduces the
    value at that location (bilinear identity on grid centers)."""
    from pointtinybenchmark_tpu.models import MSDeformAttention
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.rand(1, 8, 8, 16), jnp.float32)
    q = jnp.asarray(rng.rand(1, 3, 16), jnp.float32)
    # reference points at cell centers of cells (2,2), (4,4), (6,6)
    ref = jnp.asarray([[[2.5 / 8, 2.5 / 8], [4.5 / 8, 4.5 / 8],
                        [6.5 / 8, 6.5 / 8]]], jnp.float32)
    attn = MSDeformAttention(embed_dims=16, num_heads=2, num_levels=1,
                             num_points=1)
    variables = attn.init(jax.random.PRNGKey(0), q, ref, [v])
    out = attn.apply(variables, q, ref, [v])
    assert out.shape == (1, 3, 16)
    assert np.isfinite(np.asarray(out)).all()
