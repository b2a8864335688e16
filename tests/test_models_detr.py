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
