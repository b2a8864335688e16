"""StableHLO export (the serving artifact; reference ONNX-export role):
export a small detector, deserialize, and check output parity."""
import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport

from pointtinybenchmark_tpu.models import build_detector


def test_stablehlo_export_roundtrip(tmp_path):
    model = build_detector(
        dict(type="SingleStageDetector",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=1, num_outs=4),
             bbox_head=dict(type="RetinaHead", num_classes=2,
                            in_channels=16, feat_channels=16,
                            stacked_convs=1,
                            anchor_generator=dict(type="AnchorGenerator",
                                                  scales=[2],
                                                  ratios=[1.0],
                                                  strides=[8, 16, 32, 64]),
                            bbox_coder=dict(target_means=[0, 0, 0, 0],
                                            target_stds=[1, 1, 1, 1]))),
        None,
        dict(nms_pre=100, max_per_img=10, score_thr=0.05,
             nms=dict(iou_threshold=0.5)))
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                      jnp.float32)
    img_shape = jnp.asarray([[64, 64]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img)

    # serving signature returns flat leaves (DetResult namedtuples are a
    # host-side convenience, not part of the serialized artifact)
    fn = jax.jit(lambda i, s: tuple(jax.tree_util.tree_leaves(
        model.apply(variables, i, s, method=model.simple_test))))
    exported = jexport.export(fn)(img, img_shape)
    blob = exported.serialize()
    path = tmp_path / "model.stablehlo"
    path.write_bytes(blob)
    assert path.stat().st_size > 1000

    rehydrated = jexport.deserialize(path.read_bytes())
    out_ref = fn(img, img_shape)
    out_new = rehydrated.call(img, img_shape)
    ref_leaves = jax.tree_util.tree_leaves(out_ref)
    new_leaves = jax.tree_util.tree_leaves(out_new)
    assert len(ref_leaves) == len(new_leaves)
    for a, b in zip(ref_leaves, new_leaves):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=1e-5)
