"""LVIS-protocol (federated, frequency-binned) and Cityscapes-gating
evaluation tests (VERDICT r1 item 7; reference lvis.py:308-417,
cityscapes.py:207)."""
import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def lvis_dataset(tmp_path_factory):
    """3 cats with frequency r/c/f; img 3 declares cat2 as verified-negative
    and cat1 as not-exhaustive."""
    root = tmp_path_factory.mktemp("lvis")
    images = [
        dict(id=1, file_name="a.jpg", width=100, height=100,
             neg_category_ids=[], not_exhaustive_category_ids=[]),
        dict(id=2, file_name="b.jpg", width=100, height=100,
             neg_category_ids=[], not_exhaustive_category_ids=[]),
        dict(id=3, file_name="c.jpg", width=100, height=100,
             neg_category_ids=[2], not_exhaustive_category_ids=[1]),
    ]
    anns, aid = [], 1
    # cat1 on imgs 1+3, cat2 on img 1, cat3 on img 2
    for img_id, cat in [(1, 1), (1, 2), (2, 3), (3, 1)]:
        x, y, s = 10 * aid, 12, 20
        anns.append(dict(id=aid, image_id=img_id, category_id=cat,
                         bbox=[float(x), float(y), float(s), float(s)],
                         area=float(s * s), iscrowd=0))
        aid += 1
    cats = [dict(id=1, name="rare_thing", frequency="r"),
            dict(id=2, name="common_thing", frequency="c"),
            dict(id=3, name="freq_thing", frequency="f")]
    f = root / "lvis.json"
    with open(f, "w") as fh:
        json.dump(dict(images=images, annotations=anns, categories=cats), fh)
    from pointtinybenchmark_tpu.data.cocofmt import LVISDataset
    return LVISDataset(ann_file=str(f), pipeline=[], test_mode=True)


def _gt_results(ds, extra=None):
    """Per-image results echoing the gts, plus optional extra dets
    [(img_idx, cat_label, bbox)]."""
    results = []
    for i in range(len(ds)):
        info = ds.data_infos[i]
        anns = ds.coco.load_anns(ds.coco.get_ann_ids(img_ids=[info["id"]]))
        boxes = [[a["bbox"][0], a["bbox"][1], a["bbox"][0] + a["bbox"][2],
                  a["bbox"][1] + a["bbox"][3], 1.0] for a in anns]
        labels = [ds.cat2label[a["category_id"]] for a in anns]
        for (ii, lbl, bb) in (extra or []):
            if ii == i:
                # spurious dets outscore the gt echoes so a counted FP
                # necessarily dents the precision curve
                boxes.append(list(bb) + [1.5])
                labels.append(lbl)
        results.append(dict(bboxes=np.asarray(boxes, np.float32),
                            labels=np.asarray(labels, np.int64)))
    return results


def test_lvis_perfect_and_frequency_bins(lvis_dataset):
    ds = lvis_dataset
    stats = ds.evaluate(_gt_results(ds), metric="bbox")
    assert stats["mAP"] == pytest.approx(1.0)
    for k in ("APr", "APc", "APf"):
        assert stats[k] == pytest.approx(1.0), (k, stats)
    assert "AR@300" in stats


def test_lvis_federated_drop(lvis_dataset):
    """A spurious det of cat3 on img 3 (cat3 neither has gt there nor is a
    declared negative) must be DROPPED — metrics stay perfect. The same det
    of cat2 (a declared negative on img 3) counts as a real FP."""
    ds = lvis_dataset
    spurious_unknowable = [(2, 2, [50, 50, 70, 70])]   # cat3 (label 2)
    stats = ds.evaluate(_gt_results(ds, spurious_unknowable), metric="bbox")
    assert stats["mAP"] == pytest.approx(1.0), stats

    spurious_negative = [(2, 1, [50, 50, 70, 70])]     # cat2 (label 1)
    stats = ds.evaluate(_gt_results(ds, spurious_negative), metric="bbox")
    assert stats["APc"] < 1.0  # counted as FP for the common cat


def test_lvis_not_exhaustive_ignore(lvis_dataset):
    """An unmatched det of cat1 on img 3 (cat1 is not-exhaustive there) is
    ignored; the same det on img 1 (exhaustive) is a false positive."""
    ds = lvis_dataset
    stats = ds.evaluate(_gt_results(ds, [(2, 0, [60, 60, 80, 80])]),
                        metric="bbox")
    assert stats["APr"] == pytest.approx(1.0), stats
    stats = ds.evaluate(_gt_results(ds, [(0, 0, [60, 60, 80, 80])]),
                        metric="bbox")
    assert stats["APr"] < 1.0


def test_cityscapes_metric_gating(tmp_path):
    from pointtinybenchmark_tpu.data.cocofmt import CityscapesDataset
    images = [dict(id=1, file_name="x.jpg", width=64, height=64)]
    anns = [dict(id=1, image_id=1, category_id=1,
                 bbox=[5.0, 5.0, 20.0, 20.0], area=400.0, iscrowd=0)]
    cats = [dict(id=i + 1, name=n)
            for i, n in enumerate(CityscapesDataset.CLASSES)]
    f = tmp_path / "cs.json"
    with open(f, "w") as fh:
        json.dump(dict(images=images, annotations=anns, categories=cats), fh)
    ds = CityscapesDataset(ann_file=str(f), pipeline=[], test_mode=True)
    res = [dict(bboxes=np.asarray([[5, 5, 25, 25, 1.0]], np.float32),
                labels=np.zeros(1, np.int64))]
    # cityscapesscripts absent -> actionable gate
    with pytest.raises(ImportError, match="cityscapesscripts"):
        ds.evaluate(res, metric="cityscapes")
    # native COCO-protocol path still works
    stats = ds.evaluate(res, metric="bbox")
    assert stats["mAP_all"] == pytest.approx(1.0)
