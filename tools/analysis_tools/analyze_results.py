#!/usr/bin/env python
"""Rank evaluated images by detection quality and save visualizations of the
best/worst cases.

Parity target: TOV_mmdetection/tools/analysis_tools/analyze_results.py.
"""
import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("result_json", help="detection json from tools/test.py --out")
    p.add_argument("--show-dir", default="work_dirs/analyze")
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--split", default="test")
    args = p.parse_args()

    import numpy as np
    from PIL import Image

    from pointtinybenchmark_tpu.data import build_dataset
    from pointtinybenchmark_tpu.evaluation.merge import nms_numpy
    from pointtinybenchmark_tpu.utils import Config
    from pointtinybenchmark_tpu.visualization import imshow_gt_det_bboxes

    cfg = Config.fromfile(args.config)
    ds_cfg = dict(cfg.data[args.split])
    ds_cfg["test_mode"] = True
    dataset = build_dataset(ds_cfg)
    with open(args.result_json) as f:
        dets = json.load(f)
    by_img = {}
    for d in dets:
        by_img.setdefault(d["image_id"], []).append(d)

    # score each image: mean IoU of gts with best-matching det
    scores = []
    for idx in range(len(dataset)):
        img_id = dataset.img_ids[idx]
        ann = dataset.get_ann_info(idx)
        gts = ann["bboxes"]
        dd = by_img.get(img_id, [])
        if len(gts) == 0:
            continue
        if not dd:
            scores.append((0.0, idx))
            continue
        boxes = np.asarray([[x["bbox"][0], x["bbox"][1],
                             x["bbox"][0] + x["bbox"][2],
                             x["bbox"][1] + x["bbox"][3]] for x in dd])
        ious = np.zeros((len(gts), len(boxes)))
        for i, g in enumerate(gts):
            xx1 = np.maximum(g[0], boxes[:, 0])
            yy1 = np.maximum(g[1], boxes[:, 1])
            xx2 = np.minimum(g[2], boxes[:, 2])
            yy2 = np.minimum(g[3], boxes[:, 3])
            inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
            a1 = (g[2] - g[0]) * (g[3] - g[1])
            a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            ious[i] = inter / np.maximum(a1 + a2 - inter, 1e-6)
        scores.append((float(ious.max(1).mean()), idx))
    scores.sort()

    os.makedirs(args.show_dir, exist_ok=True)
    for tag, group in (("worst", scores[:args.topk]),
                       ("best", scores[-args.topk:])):
        for s, idx in group:
            info = dataset.data_infos[idx]
            path = osp.join(dataset.img_prefix, info["file_name"])
            if not osp.exists(path):
                continue
            img = np.asarray(Image.open(path).convert("RGB"))
            ann = dataset.get_ann_info(idx)
            dd = by_img.get(dataset.img_ids[idx], [])
            det_boxes = np.asarray(
                [[x["bbox"][0], x["bbox"][1], x["bbox"][0] + x["bbox"][2],
                  x["bbox"][1] + x["bbox"][3], x["score"]] for x in dd]
            ).reshape(-1, 5)
            det_labels = np.asarray(
                [dataset.cat_ids.index(x["category_id"]) for x in dd], int)
            out = osp.join(args.show_dir, f"{tag}_{s:.2f}_{idx}.png")
            imshow_gt_det_bboxes(img, ann["bboxes"], ann["labels"],
                                 det_boxes, det_labels,
                                 class_names=dataset.classes,
                                 score_thr=0.3, out_file=out)
            print("wrote", out)
    del nms_numpy


if __name__ == "__main__":
    main()
