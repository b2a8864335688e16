"""Hand-computed LocationEvaluator goldens (VERDICT r2 #5).

huicv's location_evaluation is not on disk, so the point-AP matching
semantics are pinned here by hand-derived fixtures instead of extremes:
the size-normalized distance boundary (matchTh x sqrt(w*h)), score-ordered
greedy assignment with multi_match_not_false_alarm both ways, maxDets
truncation, multi-class separation, explicit `point` fields, and the
add_center_from_bbox_if_no_point adapter. A factor error in the size
normalization or a match-order change fails these.

Config surface: TOV_mmdetection/mmdet/datasets/cocofmt.py:350-356 and
configs2/COCO/coarsepointv2/coarse_point_refine_r50_fpn_1x_coco400.py:99-116.
"""
import numpy as np
import pytest

from pointtinybenchmark_tpu.data.coco import COCO
from pointtinybenchmark_tpu.evaluation.location_eval import LocationEvaluator

# 101-point recThrs grid: AP of a run reaching recall r with precision p on
# the plateau = p * (#recThrs <= r) / 101
R = 101


def _gt(img_ids, anns, cats=(1,)):
    return COCO(dict(
        images=[dict(id=i, width=200, height=200, file_name=f"{i}.jpg")
                for i in img_ids],
        annotations=[dict(id=j + 1, iscrowd=0, area=a["bbox"][2] * a["bbox"][3],
                          **a) for j, a in enumerate(anns)],
        categories=[dict(id=c, name=f"c{c}") for c in cats]))


def _det(image_id, cx, cy, score, cat=1, w=4.0, h=4.0, point=None):
    d = dict(image_id=image_id, category_id=cat,
             bbox=[cx - w / 2, cy - h / 2, w, h], score=score)
    if point is not None:
        d["point"] = point
    return d


def _ap(evaluator, dets, gt):
    return evaluator(dets, gt)


def test_size_normalized_threshold_boundary():
    """gt bbox 4x9 -> size sqrt(36)=6; matchTh=0.5 -> radius 3.0 px.
    A det 2.9px away is a TP (AP=1), 3.1px away is an FP (AP=0). A
    factor-of-2 (or sqrt-less) size normalization flips both."""
    # gt center (12, 14.5)
    gt = _gt([1], [dict(image_id=1, category_id=1, bbox=[10, 10, 4, 9])])
    ev = LocationEvaluator(location_param=dict(matchThs=[0.5], maxDets=[100]))

    inside = ev([_det(1, 12 + 2.9, 14.5, 0.9)], gt)
    assert inside["AP"] == pytest.approx(1.0)
    assert inside["AR_d0.5@100"] == pytest.approx(1.0)

    outside = ev([_det(1, 12 + 3.1, 14.5, 0.9)], gt)
    assert outside["AP"] == pytest.approx(0.0)
    assert outside["AR_d0.5@100"] == pytest.approx(0.0)


def test_score_ordered_greedy_and_multi_match_flag():
    """Two dets near gt1 (scores .9/.5), one near gt2 (.3). Greedy by
    score: the .5 det double-matches gt1. multi_match_not_false_alarm=False
    counts it as FP -> AP=(51 + 50*2/3)/101; True absorbs it -> AP=1."""
    gt = _gt([1], [
        dict(image_id=1, category_id=1, bbox=[18, 18, 4, 4]),   # c (20,20)
        dict(image_id=1, category_id=1, bbox=[98, 98, 4, 4]),   # c (100,100)
    ])
    dets = [_det(1, 20.2, 20.0, 0.9), _det(1, 20.1, 20.0, 0.5),
            _det(1, 100.1, 100.0, 0.3)]

    ev_fa = LocationEvaluator(
        matcher_kwargs=dict(multi_match_not_false_alarm=False),
        location_param=dict(matchThs=[1.0], maxDets=[100]))
    got = ev_fa(dets, gt)
    want = (51 * 1.0 + 50 * (2.0 / 3.0)) / R
    assert got["AP"] == pytest.approx(want, abs=1e-9)
    assert got["AR_d1.0@100"] == pytest.approx(1.0)

    ev_ab = LocationEvaluator(
        matcher_kwargs=dict(multi_match_not_false_alarm=True),
        location_param=dict(matchThs=[1.0], maxDets=[100]))
    got = ev_ab(dets, gt)
    assert got["AP"] == pytest.approx(1.0)


def test_max_dets_truncation():
    """maxDets truncates the per-image score-ordered det list BEFORE
    matching: with maxDets=1 only the .9 det survives -> recall 0.5."""
    gt = _gt([1], [
        dict(image_id=1, category_id=1, bbox=[18, 18, 4, 4]),
        dict(image_id=1, category_id=1, bbox=[98, 98, 4, 4]),
    ])
    dets = [_det(1, 20, 20, 0.9), _det(1, 100, 100, 0.5)]

    ev1 = LocationEvaluator(location_param=dict(matchThs=[1.0], maxDets=[1]))
    got = ev1(dets, gt)
    assert got["AR_d1.0@1"] == pytest.approx(0.5)
    assert got["AP"] == pytest.approx(51 / R)

    ev2 = LocationEvaluator(location_param=dict(matchThs=[1.0], maxDets=[2]))
    assert ev2(dets, gt)["AP"] == pytest.approx(1.0)


def test_multi_class_separation():
    """Class 1 perfect, class 2 pure false alarm (det near the CLASS-1 gt:
    category separation must prevent the cross-class match) -> mean 0.5."""
    gt = _gt([1], [
        dict(image_id=1, category_id=1, bbox=[18, 18, 4, 4]),
        dict(image_id=1, category_id=2, bbox=[98, 98, 4, 4]),
    ], cats=(1, 2))
    dets = [_det(1, 20, 20, 0.9, cat=1),
            _det(1, 20, 20, 0.9, cat=2)]   # near the class-1 gt only
    ev = LocationEvaluator(location_param=dict(matchThs=[1.0], maxDets=[100]))
    got = ev(dets, gt)
    assert got["AP"] == pytest.approx(0.5)
    assert got["AR_d1.0@100"] == pytest.approx(0.5)


def test_explicit_point_fields_beat_bbox_centers():
    """gt carries an explicit `point` far from its bbox center; the det
    (also with a point field) sits on the gt POINT -> must match. Matching
    against the bbox center instead would be an FP."""
    gt = _gt([1], [dict(image_id=1, category_id=1, bbox=[10, 10, 4, 9],
                        point=[30.0, 30.0])])
    det_on_point = _det(1, 0, 0, 0.9, point=[30.2, 30.0])
    det_on_center = _det(1, 12, 14.5, 0.9)
    ev = LocationEvaluator(location_param=dict(matchThs=[0.5], maxDets=[100]))
    assert ev([det_on_point], gt)["AP"] == pytest.approx(1.0)
    assert ev([det_on_center], gt)["AP"] == pytest.approx(0.0)


def test_add_center_from_bbox_adapter():
    """Without a gt `point`: add_center=True synthesizes the bbox center;
    add_center=False drops the point-less gt entirely (npig shrinks, so a
    matching det for the OTHER gt reaches recall 1)."""
    gt = _gt([1], [
        dict(image_id=1, category_id=1, bbox=[18, 18, 4, 4]),  # no point
        dict(image_id=1, category_id=1, bbox=[96, 96, 8, 8],
             point=[100.0, 100.0]),
    ])
    dets = [_det(1, 100, 100, 0.9)]
    ev_on = LocationEvaluator(
        add_center_from_bbox_if_no_point=True,
        location_param=dict(matchThs=[1.0], maxDets=[100]))
    got = ev_on(dets, gt)
    assert got["AR_d1.0@100"] == pytest.approx(0.5)   # 1 of 2 gts found

    ev_off = LocationEvaluator(
        add_center_from_bbox_if_no_point=False,
        location_param=dict(matchThs=[1.0], maxDets=[100]))
    got = ev_off(dets, gt)
    assert got["AR_d1.0@100"] == pytest.approx(1.0)   # point-less gt dropped
    assert got["AP"] == pytest.approx(1.0)


def test_ignore_region_absorbs_without_false_alarm():
    """A det matching only an ignore/uncertain gt is absorbed (neither TP
    nor FP) and ignore gts don't count toward npig."""
    gt = _gt([1], [
        dict(image_id=1, category_id=1, bbox=[18, 18, 4, 4]),
        dict(image_id=1, category_id=1, bbox=[98, 98, 4, 4], ignore=1),
    ])
    dets = [_det(1, 20, 20, 0.9),      # TP on the real gt
            _det(1, 100, 100, 0.5)]    # lands on the ignore gt
    ev = LocationEvaluator(location_param=dict(matchThs=[1.0], maxDets=[100]))
    got = ev(dets, gt)
    assert got["AP"] == pytest.approx(1.0)
    assert got["AR_d1.0@100"] == pytest.approx(1.0)


def test_per_threshold_stats_vary_with_distance():
    """One det 1.2 sizes away: misses at matchTh=0.5/1.0, hits at 2.0 —
    the per-threshold AP_d keys must disagree accordingly."""
    gt = _gt([1], [dict(image_id=1, category_id=1, bbox=[18, 18, 4, 4])])
    dets = [_det(1, 20 + 4 * 1.2, 20, 0.9)]   # size 4 -> distance 1.2 sizes
    ev = LocationEvaluator(
        location_param=dict(matchThs=[0.5, 1.0, 2.0], maxDets=[100]))
    got = ev(dets, gt)
    assert got["AP_d0.5"] == pytest.approx(0.0)
    assert got["AP_d1.0"] == pytest.approx(0.0)
    assert got["AP_d2.0"] == pytest.approx(1.0)
    assert got["AP"] == pytest.approx(1.0 / 3.0)
