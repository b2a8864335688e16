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


def test_serve_http_roundtrip(tmp_path):
    """tools/deployment/serve.py (reference mmdet2torchserve/mmdet_handler
    role): export a tiny artifact, start the HTTP server in-process, POST a
    PNG and a base64 JSON envelope, get JSON detections back."""
    import json
    import io
    import os.path as osp
    import sys
    import threading
    import urllib.request

    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools",
                                "deployment"))
    import serve as serve_mod

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
        dict(nms_pre=100, max_per_img=10, score_thr=0.0,
             nms=dict(iou_threshold=0.5)))
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    img_shape = jnp.asarray([[64, 64]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img)
    fn = jax.jit(lambda i, s: tuple(jax.tree_util.tree_leaves(
        model.apply(variables, i, s, method=model.simple_test))))
    path = tmp_path / "tiny.stablehlo"
    path.write_bytes(jexport.export(fn)(img, img_shape).serialize())

    predictor = serve_mod.Predictor(str(path),
                                    mean=[0.0, 0.0, 0.0],
                                    std=[255.0, 255.0, 255.0])
    from http.server import ThreadingHTTPServer
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve_mod.make_handler(predictor, score_thr=0.0))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["input"] == [64, 64]

        rgb = (np.random.RandomState(0).rand(48, 56, 3) * 255
               ).astype(np.uint8)
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert "detections" in out
        assert isinstance(out["detections"], list)
        for d in out["detections"]:
            assert set(d) == {"bbox", "score", "label"}
            assert len(d["bbox"]) == 4

        # base64 JSON envelope path
        import base64
        env = json.dumps(
            {"image": base64.b64encode(buf.getvalue()).decode()}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=env, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            out2 = json.loads(r.read())
        assert out2["detections"] == out["detections"]
    finally:
        server.shutdown()
