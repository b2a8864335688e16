"""Native C++ eval kernel vs Python reference — exact-match golden test."""
import json

import numpy as np
import pytest

from pointtinybenchmark_tpu.data.coco import COCO
from pointtinybenchmark_tpu.evaluation import COCOExpandEval
from pointtinybenchmark_tpu.evaluation import native as native_mod


@pytest.fixture(scope="module")
def random_dataset():
    rng = np.random.RandomState(42)
    images, annotations, dets = [], [], []
    ann_id = 1
    for img_id in range(1, 9):
        images.append(dict(id=img_id, file_name=f"{img_id}.jpg",
                           width=200, height=200))
        for _ in range(rng.randint(2, 10)):
            x, y = rng.rand(2) * 150
            w, h = rng.rand(2) * 30 + 3
            ignore = int(rng.rand() < 0.2)
            annotations.append(dict(
                id=ann_id, image_id=img_id, category_id=int(rng.randint(1, 3)),
                bbox=[float(x), float(y), float(w), float(h)],
                area=float(w * h), iscrowd=0, ignore=ignore,
                uncertain=int(rng.rand() < 0.1)))
            ann_id += 1
        for _ in range(rng.randint(5, 25)):
            x, y = rng.rand(2) * 150
            w, h = rng.rand(2) * 30 + 3
            dets.append(dict(image_id=img_id,
                             category_id=int(rng.randint(1, 3)),
                             bbox=[float(x), float(y), float(w), float(h)],
                             score=float(rng.rand())))
    # some dets near gts for real matches
    for a in annotations[::2]:
        bb = a["bbox"]
        dets.append(dict(image_id=a["image_id"], category_id=a["category_id"],
                         bbox=[bb[0] + 1, bb[1] - 1, bb[2], bb[3]],
                         score=float(rng.rand() * 0.5 + 0.5)))
    ds = dict(images=images, annotations=annotations,
              categories=[dict(id=1, name="a"), dict(id=2, name="b")])
    return ds, dets


def _run_eval(ds, dets, force_python):
    gt = COCO(ds)
    ev = COCOExpandEval(gt, gt.loadRes(json.loads(json.dumps(dets))), "bbox",
                        ignore_uncertain=True, use_ignore_attr=True,
                        use_iod_for_ignore=True,
                        iod_th_of_iou_f="lambda iou: iou",
                        cocofmt_param=dict(evaluate_standard="tiny",
                                           maxDets=[1000]))
    if force_python:
        orig = native_mod.get_lib
        native_mod.get_lib = lambda: None
        try:
            ev.evaluate()
        finally:
            native_mod.get_lib = orig
    else:
        ev.evaluate()
    ev.accumulate()
    return ev.summarize()


def test_native_lib_builds():
    assert native_mod.get_lib() is not None, "native eval lib failed to build"


def test_native_matches_python_exactly(random_dataset):
    ds, dets = random_dataset
    s_py = _run_eval(ds, dets, force_python=True)
    s_cc = _run_eval(ds, dets, force_python=False)
    assert set(s_py) == set(s_cc)
    for k in s_py:
        np.testing.assert_allclose(s_cc[k], s_py[k], atol=1e-12,
                                   err_msg=f"metric {k} differs")


def test_native_iou_matrix_matches_numpy():
    if native_mod.get_lib() is None:
        pytest.skip("no native lib")
    rng = np.random.RandomState(0)
    det = rng.rand(13, 4) * 50 + 1
    gt = rng.rand(7, 4) * 50 + 1
    iod = np.asarray([0, 1, 0, 1, 0, 0, 1], np.uint8)
    got = native_mod.iou_matrix_native(det, gt, iod)
    from pointtinybenchmark_tpu.evaluation.cocoeval import _bbox_iou_matrix
    want = _bbox_iou_matrix(det, gt, iod.astype(bool))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_rle_iou_native_vs_dense():
    """Native RLE-domain mask IoU (pycocotools rleIou two-pointer merge)
    == dense bitmap formulation, incl. crowd (IoD) columns and empty
    masks."""
    import numpy as np

    from pointtinybenchmark_tpu.evaluation.mask_utils import (
        _rle_counts, mask_iou, rle_encode)
    from pointtinybenchmark_tpu.evaluation.native import rle_iou_native

    rng = np.random.RandomState(0)
    h, w = 37, 53
    def rand_mask(p):
        return (rng.rand(h, w) < p).astype(np.uint8)
    dt = [rle_encode(rand_mask(p)) for p in (0.3, 0.05, 0.0, 0.7)]
    gt = [rle_encode(rand_mask(p)) for p in (0.3, 0.5, 0.0)]
    iscrowd = [0, 1, 0]
    native = rle_iou_native([_rle_counts(r) for r in dt],
                            [_rle_counts(r) for r in gt], iscrowd)
    if native is None:  # no toolchain — fallback covered elsewhere
        return
    # dense reference: force the python path by computing it inline
    from pointtinybenchmark_tpu.evaluation.mask_utils import rle_decode
    dm = np.stack([rle_decode(r).astype(bool).ravel() for r in dt])
    gm = np.stack([rle_decode(r).astype(bool).ravel() for r in gt])
    inter = dm.astype(np.float64) @ gm.T.astype(np.float64)
    da = dm.sum(1)[:, None].astype(np.float64)
    ga = gm.sum(1)[None, :].astype(np.float64)
    union = np.where(np.asarray(iscrowd, bool)[None, :], da, da + ga - inter)
    dense = inter / np.maximum(union, 1e-10)
    np.testing.assert_allclose(native, dense, atol=1e-12)
    # and the public mask_iou (now routed through the native path) agrees
    np.testing.assert_allclose(mask_iou(dt, gt, iscrowd), dense, atol=1e-12)
