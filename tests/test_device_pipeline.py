"""On-device preprocessing goldens: DevicePreprocessor must be bit-identical
to the host pipeline (Normalize -> tile crops -> Pad) it replaces."""
import numpy as np
import pytest

from pointtinybenchmark_tpu.data import DevicePreprocessor, tile_grid
from pointtinybenchmark_tpu.data.transforms import Normalize, Pad

MEAN = (123.675, 116.28, 103.53)
STD = (58.395, 57.12, 57.375)


def _host_tiles(frame, tile_hw, overlap_wh, mean=MEAN, std=STD,
                pad_val=0.0):
    """The host pipeline verbatim: CroppedTilesFlipAug tile crops, then
    per-tile Normalize + Pad(size=tile) — the order the test pipeline
    configs run (crop raw, then transforms)."""
    h, w = frame.shape[:2]
    th, tw = tile_hw
    rects = tile_grid(w, h, tw, th, *overlap_wh)
    norm = Normalize(mean, std)
    pad = Pad(size=(th, tw), pad_val=pad_val)
    out, offs = [], []
    for (l, u, r, b) in rects:
        res = {"img": frame[u:b, l:r].astype(np.float32)}
        res = pad(norm(res))
        out.append(res["img"])
        offs.append((l, u))
    return np.stack(out), np.asarray(offs, np.float32)


def test_device_tiled_bit_identical_to_host():
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 256, (1080, 1920, 3), np.uint8)
    pre = DevicePreprocessor((1080, 1920), MEAN, STD,
                             tile_hw=(512, 640), tile_overlap=(100, 100))
    got = np.asarray(pre(frame))
    want, offs = _host_tiles(frame, (512, 640), (100, 100))
    assert pre.n_views == 12
    np.testing.assert_array_equal(pre.tile_offsets, offs)
    np.testing.assert_array_equal(got, want)  # bit-exact, not allclose


def test_device_tiled_batch_view_major():
    """(N, H, W, 3) batches come out image-major: frame i's tiles are
    rows [i*V, (i+1)*V) like the host collator's view stacking."""
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (2, 256, 384, 3), np.uint8)
    pre = DevicePreprocessor((256, 384), MEAN, STD,
                             tile_hw=(128, 192), tile_overlap=(0, 0))
    got = np.asarray(pre(frames))
    v = pre.n_views
    for i in range(2):
        want, _ = _host_tiles(frames[i], (128, 192), (0, 0))
        np.testing.assert_array_equal(got[i * v:(i + 1) * v], want)


def test_device_pad_when_frame_smaller_than_tile():
    """Frames smaller than one tile hit the pad path; host Pad fills with
    pad_val AFTER Normalize, and the device must match that convention."""
    rng = np.random.RandomState(2)
    frame = rng.randint(0, 256, (100, 150, 3), np.uint8)
    pre = DevicePreprocessor((100, 150), MEAN, STD,
                             tile_hw=(128, 192), pad_val=0.0)
    got = np.asarray(pre(frame))
    want, _ = _host_tiles(frame, (128, 192), (0, 0))
    assert got.shape == (1, 128, 192, 3)
    np.testing.assert_array_equal(got, want)
    assert got[0, -1, -1, 0] == 0.0  # pad_val in normalized space


def test_device_plain_pad_divisor():
    """Untiled mode: Normalize + Pad(size_divisor) parity."""
    rng = np.random.RandomState(3)
    frame = rng.randint(0, 256, (500, 700, 3), np.uint8)
    pre = DevicePreprocessor((500, 700), MEAN, STD, pad_divisor=32)
    got = np.asarray(pre(frame))
    res = Pad(size_divisor=32)(Normalize(MEAN, STD)(
        {"img": frame.astype(np.float32)}))
    assert got.shape == (1, 512, 704, 3)
    np.testing.assert_array_equal(got[0], res["img"])


def test_device_preprocessor_fusable_inside_jit():
    """pre.apply must be traceable inside a caller's own jit (the e2e path
    fuses preprocessing into the inference graph)."""
    import jax
    import jax.numpy as jnp
    pre = DevicePreprocessor((64, 96), MEAN, STD, tile_hw=(32, 48))

    @jax.jit
    def step(frames):
        tiles = pre.apply(frames)
        return tiles.sum()

    rng = np.random.RandomState(4)
    frames = jnp.asarray(rng.randint(0, 256, (1, 64, 96, 3), np.uint8))
    want, _ = _host_tiles(np.asarray(frames[0]), (32, 48), (0, 0))
    np.testing.assert_allclose(float(step(frames)), want.sum(), rtol=1e-6)


def _tiny_detector():
    from pointtinybenchmark_tpu.models import build_detector
    return build_detector(
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


def test_device_tiled_inference_matches_host_pipeline():
    """End-to-end wiring golden (VERDICT r4 item 2): DeviceTiledInference
    (uint8 frame in, preprocessing + forward + shift + global NMS in one
    jit) produces detections IDENTICAL to the host pipeline (host
    Normalize/tile crops -> same model forward -> merge_tile_dets)."""
    import jax
    import jax.numpy as jnp

    from pointtinybenchmark_tpu.engine.test import (DeviceTiledInference,
                                                    merge_tile_dets)

    model = _tiny_detector()
    rng = np.random.RandomState(5)
    frame = rng.randint(0, 256, (128, 192, 3), np.uint8)
    tile_hw, overlap = (64, 96), (16, 16)

    host_tiles, offs = _host_tiles(frame, tile_hw, overlap)
    v = host_tiles.shape[0]
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(host_tiles[:1]), train=False)

    # host-pipeline reference: batched forward on host-prepared tiles,
    # shift by tile offsets, global class-aware NMS (run_tiled_test body)
    img_shape = jnp.tile(jnp.asarray([[64, 96]], jnp.int32), (v, 1))
    dets, _ = jax.jit(lambda x: model.apply(
        variables, x, img_shape, None, False,
        method=model.simple_test))(jnp.asarray(host_tiles))
    db = np.asarray(dets.bboxes)
    shift = np.concatenate([offs, offs], 1)[:, None, :]
    boxes = db[..., :4] + shift
    mb, ms, ml = merge_tile_dets(
        boxes.reshape(-1, 4), db[..., 4].reshape(-1),
        np.asarray(dets.labels).reshape(-1),
        np.asarray(dets.valid).reshape(-1), 0.5, 50)

    eng = DeviceTiledInference(model, variables, (128, 192), tile_hw,
                               tile_overlap=overlap, max_per_img=50)
    got = eng(frame)[0]

    assert got["bboxes"].shape[0] == mb.shape[0] > 0
    np.testing.assert_allclose(got["bboxes"][:, :4], mb, atol=1e-5)
    np.testing.assert_allclose(got["bboxes"][:, 4], ms, atol=1e-6)
    np.testing.assert_array_equal(got["labels"], ml)


def test_inference_detector_tiled_api(tmp_path):
    """apis.inference_detector_tiled: config-driven tile/norm extraction +
    device-preprocessed inference on a raw ndarray frame."""
    from pointtinybenchmark_tpu.apis.inference import (
        inference_detector_tiled, init_detector)
    from pointtinybenchmark_tpu.utils.config import Config

    cfg_text = """
img_norm = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="CroppedTilesFlipAug", tile_shape=(96, 64), tile_overlap=(16, 16),
         scale_factor=[1.0], flip=False,
         transforms=[
             dict(type="Resize", keep_ratio=True),
             dict(type="RandomFlip"),
             dict(type="Normalize", **img_norm),
             dict(type="Pad", size=(64, 96)),
             dict(type="Collect", keys=["img"]),
         ]),
]
data = dict(test=dict(type="CocoFmtDataset", ann_file="", img_prefix="",
                      pipeline=test_pipeline))
loader = dict(pad_shape=(64, 96))
model = dict(
    type="SingleStageDetector",
    backbone=dict(type="ResNet", depth=18, base_channels=8),
    neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
              start_level=0, add_extra_convs="on_input", num_outs=5),
    bbox_head=dict(
        type="RetinaHead", num_classes=2, in_channels=16,
        feat_channels=16, stacked_convs=1,
        anchor_generator=dict(type="AnchorGenerator", octave_base_scale=2,
                              scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                              strides=[4, 8, 16, 32, 64]),
        bbox_coder=dict(target_means=[0, 0, 0, 0], target_stds=[1, 1, 1, 1]),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type="L1Loss", loss_weight=1.0)))
test_cfg = dict(nms_pre=200, score_thr=0.02,
                nms=dict(type="nms", iou_threshold=0.5), max_per_img=50)
"""
    p = tmp_path / "cfg.py"
    p.write_text(cfg_text)
    handle = init_detector(Config.fromfile(str(p)))
    frame = np.random.RandomState(6).randint(0, 256, (128, 192, 3), np.uint8)
    res = inference_detector_tiled(handle, frame)
    assert res["bboxes"].shape[1] == 5
    assert res["bboxes"].shape[0] == res["labels"].shape[0] > 0
    assert (res["bboxes"][:, 0] >= -64).all() and \
        (res["bboxes"][:, 2] <= 192 + 64).all()
    # engine cache: second call reuses the compiled engine
    res2 = inference_detector_tiled(handle, frame)
    np.testing.assert_array_equal(res["bboxes"], res2["bboxes"])
