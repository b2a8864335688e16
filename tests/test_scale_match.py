import json

import numpy as np
import pytest

from pointtinybenchmark_tpu.data.scale_match import (GaussianScaleMatch,
                                                     MonotonicityScaleMatch,
                                                     ScaleMatch,
                                                     ScaleMatchResize,
                                                     get_distribute)


def _write_anno(path, sizes):
    anns = [dict(id=i + 1, image_id=(i % 5) + 1, category_id=1,
                 bbox=[0.0, 0.0, float(s), float(s)], area=float(s * s),
                 iscrowd=0, ignore=0)
            for i, s in enumerate(sizes)]
    ds = dict(images=[dict(id=i + 1, file_name=f"x{i}.jpg", width=1000,
                           height=1000) for i in range(5)],
              annotations=anns, categories=[dict(id=1, name="p")])
    with open(path, "w") as f:
        json.dump(ds, f)
    return str(path)


@pytest.fixture()
def anno_files(tmp_path):
    rng = np.random.RandomState(0)
    src = _write_anno(tmp_path / "src.json",
                      rng.lognormal(np.log(100), 0.3, 500))  # big objects
    dst = _write_anno(tmp_path / "dst.json",
                      rng.lognormal(np.log(10), 0.3, 500))   # tiny objects
    return src, dst


def test_get_distribute_is_probability():
    sizes = np.random.RandomState(1).lognormal(3, 0.5, 1000)
    anns = [dict(bbox=[0, 0, s, s], iscrowd=0) for s in sizes]
    c, s = get_distribute(anns, bins=50, except_rate=0.04)
    assert c.sum() == pytest.approx(1.0)
    assert len(s) == len(c) + 1
    assert np.all(np.diff(s) >= 0)


def test_scale_match_shrinks_big_objects(anno_files):
    src, dst = anno_files
    sm = ScaleMatch(anno_file=dst, bins=50, scale_range=(0.01, 2.0))
    rng = np.random.RandomState(2)
    boxes = np.asarray([[10, 10, 110, 110], [50, 50, 160, 160.]])  # ~100px
    scales = []
    for _ in range(20):
        nh, nw = sm.get_new_size((1000, 1000), boxes, rng)
        scales.append(nh / 1000)
    # target sizes ~10px vs src ~105px -> scale ~0.1
    assert 0.03 < np.mean(scales) < 0.3


def test_scale_match_empty_gt_default(anno_files):
    _, dst = anno_files
    sm = ScaleMatch(anno_file=dst, default_scale=1.0)
    size = sm.get_new_size((600, 800), np.zeros((0, 4)),
                           np.random.RandomState(0))
    assert size == (600, 800)


def test_scale_match_scale_range_clip(anno_files):
    _, dst = anno_files
    sm = ScaleMatch(anno_file=dst, scale_range=(0.5, 2.0),
                    out_scale_deal="clip", max_sample_try=1)
    rng = np.random.RandomState(3)
    boxes = np.asarray([[0, 0, 300, 300.]])  # scale ~10/300 -> clipped to 0.5
    nh, nw = sm.get_new_size((1000, 1000), boxes, rng)
    assert nh / 1000 == pytest.approx(0.5, abs=0.01)


def test_monotonicity_scale_match_monotone(anno_files):
    src, dst = anno_files
    msm = MonotonicityScaleMatch(src, dst, bins=50, scale_range=(0.001, 3.0))
    outs = [msm._map_size(s) for s in [60.0, 90.0, 120.0, 150.0]]
    assert all(np.diff(outs) >= -1e-6)  # monotone
    assert outs[0] < 30  # mapped into tiny regime


def test_gaussian_scale_match(anno_files):
    src, _ = anno_files
    gsm = GaussianScaleMatch(src, mu_sigma=(np.log(12), 0.3), bins=50,
                             use_log_bins=True, num_gaussian_samples=20000)
    mapped = gsm._map_size(100.0)
    assert 3 < mapped < 40  # into the gaussian tiny regime


def test_scale_match_resize_pipeline(anno_files):
    src, dst = anno_files
    t = ScaleMatchResize(scale_match_type="MonotonicityScaleMatch",
                         src_anno_file=src, dst_anno_file=dst,
                         scale_range=(0.01, 3.0))
    img = np.zeros((200, 300, 3), np.float32)
    results = dict(img=img, img_shape=img.shape,
                   gt_bboxes=np.asarray([[10, 10, 110, 110.]], np.float32),
                   gt_labels=np.asarray([0]),
                   gt_bboxes_ignore=np.zeros((0, 4), np.float32),
                   bbox_fields=["gt_bboxes", "gt_bboxes_ignore"],
                   _rng=np.random.RandomState(0))
    out = t(results)
    assert out["img"].shape[0] < 200  # shrunk toward tiny distribution
    assert out["scale_factor"].shape == (4,)
    assert len(out["gt_bboxes"]) <= 1


def test_reaspect():
    from pointtinybenchmark_tpu.data.scale_match import ReAspect
    t = ReAspect(aspects=(2.0,))
    img = np.zeros((100, 100, 3), np.float32)
    boxes = np.asarray([[10, 10, 30, 30.]], np.float32)  # aspect 1.0
    results = dict(img=img, img_shape=img.shape, gt_bboxes=boxes.copy(),
                   bbox_fields=["gt_bboxes"],
                   _rng=np.random.RandomState(0))
    out = t(results)
    b = out["gt_bboxes"][0]
    new_aspect = (b[3] - b[1]) / (b[2] - b[0])
    assert abs(new_aspect - 2.0) < 0.1
