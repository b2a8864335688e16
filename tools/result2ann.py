#!/usr/bin/env python
"""Convert CPR refined-point detections (keyed by ann_id) back into a COCO
training annotation json for stage-2 (P2P) training.

Parity target: TOV_mmdetection/exp/tools/result2ann.py:52-92 — each refined
detection replaces its original annotation's bbox (optionally with a fixed
new width/height around the refined center), completing the CPR -> retrain
workflow (docs/cpr/README.md:82-99).
"""
import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def xywh2centerwh(xywh):
    x1, y1, w, h = xywh
    return [x1 + w / 2, y1 + h / 2, w, h]


def centerwh2xywh(cwh):
    xc, yc, w, h = cwh
    return [xc - w / 2, yc - h / 2, w, h]


def turn_bbox_wh(bbox, new_wh):
    """Keep the center, replace w/h (reference :40-50)."""
    if new_wh[0] > 0 and new_wh[1] > 0:
        xc, yc, _, _ = xywh2centerwh(bbox)
        bbox = centerwh2xywh([xc, yc, new_wh[0], new_wh[1]])
    return bbox


def result_to_annotation(ori_ann_file: str, det_results, new_wh=(-1, -1)):
    """Returns the updated dataset dict."""
    with open(ori_ann_file) as f:
        dataset = json.load(f)
    if isinstance(det_results, str):
        with open(det_results) as f:
            det_results = json.load(f)
    by_ann_id = {d["ann_id"]: d for d in det_results if "ann_id" in d}
    n_updated = 0
    for ann in dataset.get("annotations", []):
        det = by_ann_id.get(ann["id"])
        if det is None:
            continue
        assert det.get("image_id") == ann["image_id"], (det, ann)
        ann["bbox"] = turn_bbox_wh(list(det["bbox"]), new_wh)
        ann["area"] = ann["bbox"][2] * ann["bbox"][3]
        if "point" in det:
            ann["point"] = list(det["point"])
        n_updated += 1
    return dataset, n_updated


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ori_ann", required=True)
    p.add_argument("--det_file", required=True)
    p.add_argument("--save_ann", required=True)
    p.add_argument("--wh", default=-1, type=float)
    args = p.parse_args()
    wh = (args.wh, args.wh)
    dataset, n = result_to_annotation(args.ori_ann, args.det_file, wh)
    with open(args.save_ann, "w") as f:
        json.dump(dataset, f)
    print(f"updated {n} annotations -> {args.save_ann}")


if __name__ == "__main__":
    main()
