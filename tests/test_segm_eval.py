"""Segm (mask) + proposal evaluation (VERDICT r1 item 2; reference
mmdet/datasets/coco.py:373-460, pycocotools maskUtils semantics)."""
import json

import numpy as np
import pytest


# ------------------------------------------------------------------ RLE codec
def test_rle_roundtrip_area_bbox():
    from pointtinybenchmark_tpu.evaluation.mask_utils import (
        rle_area, rle_decode, rle_encode, rle_to_bbox)
    rng = np.random.RandomState(0)
    for _ in range(20):
        h, w = rng.randint(1, 40, 2)
        m = (rng.rand(h, w) < 0.3).astype(np.uint8)
        rle = rle_encode(m)
        assert isinstance(rle["counts"], str)
        np.testing.assert_array_equal(rle_decode(rle), m)
        assert rle_area(rle) == int(m.sum())
        if m.sum():
            ys, xs = np.nonzero(m)
            assert rle_to_bbox(rle) == [float(xs.min()), float(ys.min()),
                                        float(xs.max() - xs.min() + 1),
                                        float(ys.max() - ys.min() + 1)]

    # structural golden: single pixel at (0,0) of 3x3 -> runs [0,1,8] ->
    # maskApi varint string "018"
    m = np.zeros((3, 3), np.uint8)
    m[0, 0] = 1
    assert rle_encode(m)["counts"] == "018"


def test_rle_uncompressed_and_polygon_inputs():
    from pointtinybenchmark_tpu.evaluation.mask_utils import (ann_to_rle,
                                                              rle_decode)
    # uncompressed counts list
    rle = ann_to_rle({"size": [3, 3], "counts": [0, 1, 8]}, 3, 3)
    m = rle_decode(rle)
    assert m[0, 0] == 1 and m.sum() == 1
    # polygon square [2,2]..[6,6] in a 8x8 image
    rle = ann_to_rle([[2, 2, 6, 2, 6, 6, 2, 6]], 8, 8)
    m = rle_decode(rle)
    assert m[4, 4] == 1 and m[0, 0] == 0 and m.sum() >= 16


def test_mask_iou_semantics():
    from pointtinybenchmark_tpu.evaluation.mask_utils import (mask_iou,
                                                              rle_encode)
    a = np.zeros((10, 10), np.uint8)
    a[0:4, 0:4] = 1  # 16 px
    b = np.zeros((10, 10), np.uint8)
    b[2:6, 2:6] = 1  # 16 px, overlap 4
    ra, rb = rle_encode(a), rle_encode(b)
    iou = mask_iou([ra], [rb], [0])
    np.testing.assert_allclose(iou[0, 0], 4 / 28, atol=1e-9)
    # crowd: union = area(dt)
    iou = mask_iou([ra], [rb], [1])
    np.testing.assert_allclose(iou[0, 0], 4 / 16, atol=1e-9)
    # identity
    np.testing.assert_allclose(mask_iou([ra], [ra], [0])[0, 0], 1.0)


def test_paste_masks():
    from pointtinybenchmark_tpu.evaluation.mask_utils import paste_masks
    crops = np.ones((1, 4, 4), np.float32)
    out = paste_masks(crops, np.array([[10.0, 5.0, 20.0, 15.0]]), 30, 40)
    assert out.shape == (1, 30, 40)
    # interior of the box is filled, far outside is empty
    assert out[0, 10, 15] == 1
    assert out[0, 0, 0] == 0
    area = out[0].sum()
    assert 80 <= area <= 140  # ~10x10 box


def _paste_masks_loop(crops, boxes, h, w, threshold=0.5):
    """Per-mask loop oracle (the pre-round-5 implementation verbatim)."""
    M, s, _ = crops.shape
    out = np.zeros((M, h, w), np.uint8)
    for i in range(M):
        x1, y1, x2, y2 = boxes[i][:4]
        bx1 = max(int(np.floor(x1)), 0)
        by1 = max(int(np.floor(y1)), 0)
        bx2 = min(int(np.ceil(x2)) + 1, w)
        by2 = min(int(np.ceil(y2)) + 1, h)
        if bx2 <= bx1 or by2 <= by1 or x2 <= x1 or y2 <= y1:
            continue
        ys = (np.arange(by1, by2) + 0.5 - y1) / (y2 - y1) * s - 0.5
        xs = (np.arange(bx1, bx2) + 0.5 - x1) / (x2 - x1) * s - 0.5
        y0 = np.clip(np.floor(ys).astype(int), 0, s - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, s - 1)
        y1i = np.clip(y0 + 1, 0, s - 1)
        x1i = np.clip(x0 + 1, 0, s - 1)
        wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
        wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
        c = crops[i]
        patch = (c[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
                 + c[np.ix_(y0, x1i)] * (1 - wy) * wx
                 + c[np.ix_(y1i, x0)] * wy * (1 - wx)
                 + c[np.ix_(y1i, x1i)] * wy * wx)
        out[i, by1:by2, bx1:bx2] = patch >= threshold
    return out


def test_paste_masks_batched_matches_loop_oracle():
    """Vectorized paste == the per-mask loop, incl. degenerate/offscreen/
    frame-sized boxes (exercises the chunked pad-to-max path)."""
    from pointtinybenchmark_tpu.evaluation.mask_utils import paste_masks
    rng = np.random.RandomState(7)
    h, w, s = 108, 192, 28
    M = 60
    crops = rng.rand(M, s, s).astype(np.float32)
    cx = rng.uniform(-10, w + 10, M)
    cy = rng.uniform(-10, h + 10, M)
    bw = rng.uniform(0, 40, M)
    bh = rng.uniform(0, 40, M)
    boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1)
    boxes[0] = [5.0, 5.0, 5.0, 9.0]            # zero-width (degenerate)
    boxes[1] = [-50.0, -50.0, -10.0, -10.0]    # fully offscreen
    boxes[2] = [-5.0, -5.0, w + 5.0, h + 5.0]  # frame-sized
    boxes[3] = [10.2, 3.7, 10.9, 4.1]          # sub-pixel box
    got = paste_masks(crops, boxes, h, w)
    want = _paste_masks_loop(crops, boxes, h, w)
    np.testing.assert_array_equal(got, want)
    # tiny chunk budget forces the multi-chunk path; result must be unchanged
    import pointtinybenchmark_tpu.evaluation.mask_utils as mu
    old = mu._PASTE_CHUNK_BUDGET
    try:
        mu._PASTE_CHUNK_BUDGET = 2048
        np.testing.assert_array_equal(paste_masks(crops, boxes, h, w), want)
    finally:
        mu._PASTE_CHUNK_BUDGET = old


# ------------------------------------------------------- dataset-level oracle
@pytest.fixture(scope="module")
def segm_dataset(tmp_path_factory):
    """4 images, 2 square instances each (polygon segm), one crowd region."""
    root = tmp_path_factory.mktemp("segm")
    images, annotations = [], []
    ann_id = 1
    rng = np.random.RandomState(0)
    for i in range(4):
        images.append(dict(id=i + 1, file_name=f"i{i}.jpg", width=64,
                           height=64))
        for j in range(2):
            x, y = int(rng.randint(4, 30)), int(rng.randint(4, 30))
            s = int(rng.randint(8, 20))
            annotations.append(dict(
                id=ann_id, image_id=i + 1, category_id=1,
                bbox=[float(x), float(y), float(s), float(s)],
                area=float(s * s), iscrowd=0,
                segmentation=[[x, y, x + s, y, x + s, y + s, x, y + s]]))
            ann_id += 1
    json_file = root / "ann.json"
    with open(json_file, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name="thing")]), f)
    from pointtinybenchmark_tpu.data import CocoFmtDataset
    ds = CocoFmtDataset(ann_file=str(json_file), pipeline=[], test_mode=True)
    return ds


def _gt_as_results(ds, perturb=0.0, drop_last=False):
    from pointtinybenchmark_tpu.evaluation.mask_utils import (polys_to_mask,
                                                              rle_encode)
    results = []
    for i in range(len(ds)):
        info = ds.data_infos[i]
        anns = ds.coco.load_anns(ds.coco.get_ann_ids(img_ids=[info["id"]]))
        if drop_last and i == len(ds) - 1:
            anns = anns[:-1]
        boxes, masks = [], []
        for a in anns:
            x, y, w, h = a["bbox"]
            dx = perturb * w
            boxes.append([x + dx, y, x + w + dx, y + h, 1.0])
            m = polys_to_mask(a["segmentation"], info["height"],
                              info["width"])
            if perturb:
                m = np.roll(m, int(dx), axis=1)
            masks.append(rle_encode(m))
        results.append(dict(bboxes=np.asarray(boxes, np.float32),
                            labels=np.zeros(len(boxes), np.int64),
                            masks=masks))
    return results


def test_segm_metric_perfect_and_degraded(segm_dataset):
    ds = segm_dataset
    stats = ds.evaluate(_gt_as_results(ds), metric=["bbox", "segm"])
    assert stats["bbox_mAP_all"] == pytest.approx(1.0)
    assert stats["segm_mAP_all"] == pytest.approx(1.0)
    # perturbed masks: strictly worse segm AP at high IoU
    stats_bad = ds.evaluate(_gt_as_results(ds, perturb=0.4),
                            metric=["segm"])
    assert stats_bad["mAP_all"] < 1.0


def test_proposal_metrics(segm_dataset):
    ds = segm_dataset
    res = _gt_as_results(ds)
    stats = ds.evaluate(res, metric="proposal")
    assert stats["AR@100"] == pytest.approx(1.0)
    assert "AR@1000" in stats and "AR_small@1000" in stats
    # proposal_fast greedy recall
    stats = ds.evaluate(res, metric="proposal_fast")
    assert stats["AR@100"] == pytest.approx(1.0)
    # dropping a gt's proposal lowers recall
    stats = ds.evaluate(_gt_as_results(ds, drop_last=True),
                        metric="proposal_fast")
    assert stats["AR@100"] < 1.0


def test_eval_recalls_matches_reference_semantics():
    """Greedy one-to-one matching (mmdet core/evaluation/recall.py)."""
    from pointtinybenchmark_tpu.evaluation.recall import eval_recalls
    gts = [np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)]
    # one proposal covers gt0 exactly, a second overlaps gt1 at ~0.47 IoU
    props = [np.array([[0, 0, 10, 10, 0.9], [20, 20, 28, 28, 0.8]], float)]
    r = eval_recalls(gts, props, [1, 2], [0.3, 0.5])
    # top-1 proposal only matches gt0
    np.testing.assert_allclose(r[0], [0.5, 0.5])
    # top-2: gt1 matched at 0.3 threshold but not 0.5 (iou=64/100)
    np.testing.assert_allclose(r[1], [1.0, 1.0])


def test_maskrcnn_e2e_segm_eval(tmp_path):
    """Mask R-CNN inference -> paste -> RLE -> segm+bbox+proposal metrics
    all report finite values (VERDICT r1 'done' criterion)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from pointtinybenchmark_tpu.data import CocoFmtDataset, DetCollator
    from pointtinybenchmark_tpu.engine.test import run_test
    from pointtinybenchmark_tpu.models import build_detector

    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(2):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            tmp_path / f"im{i}.jpg")
        images.append(dict(id=i + 1, file_name=f"im{i}.jpg", width=64,
                           height=64))
        x, y, s = 10 + i * 5, 12, 20
        annotations.append(dict(
            id=i + 1, image_id=i + 1, category_id=1,
            bbox=[float(x), float(y), float(s), float(s)],
            area=float(s * s), iscrowd=0,
            segmentation=[[x, y, x + s, y, x + s, y + s, x, y + s]]))
    with open(tmp_path / "ann.json", "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name="p")]), f)

    pipeline = [
        dict(type="LoadImageFromFile"),
        dict(type="Resize", scale_factor=[1.0], keep_ratio=True),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="Pad", size_divisor=32),
        dict(type="Collect", keys=["img"]),
    ]
    ds = CocoFmtDataset(ann_file=str(tmp_path / "ann.json"),
                        img_prefix=str(tmp_path), pipeline=pipeline,
                        test_mode=True)
    model = build_detector(
        dict(type="MaskRCNN",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, num_outs=5),
             rpn_head=dict(type="RPNHead", num_classes=1, in_channels=16,
                           feat_channels=16,
                           anchor_generator=dict(scales=[4],
                                                 ratios=[1.0],
                                                 strides=[4, 8, 16, 32, 64])),
             roi_head=dict(
                 type="StandardRoIHead",
                 bbox_roi_extractor=dict(
                     roi_layer=dict(type="RoIAlign", output_size=7),
                     out_channels=16, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(type="Shared2FCBBoxHead", num_classes=1,
                                in_channels=16, fc_out_channels=32,
                                roi_feat_size=7,
                                bbox_coder=dict(
                                    target_means=[0, 0, 0, 0],
                                    target_stds=[0.1, 0.1, 0.2, 0.2]),
                                loss_cls=dict(type="CrossEntropyLoss",
                                              loss_weight=1.0),
                                loss_bbox=dict(type="L1Loss",
                                               loss_weight=1.0)),
                 mask_head=dict(type="FCNMaskHead", num_convs=1,
                                in_channels=16, conv_out_channels=16,
                                num_classes=1))),
        None,
        dict(rpn=dict(nms_pre=100, max_per_img=32,
                      nms=dict(iou_threshold=0.7), min_bbox_size=0),
             rcnn=dict(score_thr=0.0, nms=dict(iou_threshold=0.5),
                       max_per_img=5)))
    sample = ds[0]
    img = jnp.asarray(sample["img"][None])
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    state = dict(params=variables["params"],
                 batch_stats=variables.get("batch_stats", {}))
    collator = DetCollator(pad_shape=(64, 64))
    results = run_test(model, state, ds, collator, batch_size=1)
    assert len(results) == 2
    assert "masks" in results[0]
    for r in results:
        for rle in r["masks"]:
            assert set(rle) == {"size", "counts"}
    stats = ds.evaluate(results, metric=["bbox", "segm", "proposal"])
    for k, v in stats.items():
        assert np.isfinite(v), (k, v)
    assert any(k.startswith("segm_") for k in stats)
    assert "proposal_AR@100" in stats or "AR@100" in stats
