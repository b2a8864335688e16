#!/usr/bin/env python
"""Convert Cityscapes gtFine annotations to COCO format — NATIVE.

Parity target: TOV_mmdetection/tools/dataset_converters/cityscapes.py,
which requires `cityscapesscripts` + `pycocotools`. Neither is needed here:
the instance-id PNGs are read with PIL, the label table below embeds the
8 instance-evaluated Cityscapes classes (cityscapesscripts
helpers/labels.py values), and RLE encoding uses the framework's own codec
(evaluation/mask_utils.py, pycocotools-compatible counts strings).

Usage:
    python tools/dataset_converters/cityscapes.py CITYSCAPES_ROOT \
        [--img-dir leftImg8bit] [--gt-dir gtFine] [-o OUT_DIR]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

from pointtinybenchmark_tpu.evaluation.mask_utils import (  # noqa: E402
    rle_area, rle_encode, rle_to_bbox)

# (label_id, name) for labels with hasInstances and not ignoreInEval
# (cityscapesscripts helpers/labels.py)
INSTANCE_CLASSES = [
    (24, "person"), (25, "rider"), (26, "car"), (27, "truck"),
    (28, "bus"), (31, "train"), (32, "motorcycle"), (33, "bicycle"),
]
INSTANCE_IDS = {i for i, _ in INSTANCE_CLASSES}


def load_img_info(img_file: str, inst_file: str, segm_file: str,
                  img_dir: str) -> dict:
    """One image -> img_info dict (reference load_img_info semantics)."""
    inst_img = np.asarray(Image.open(inst_file))
    anno_info = []
    # ids < 24 are stuff labels
    for inst_id in np.unique(inst_img[inst_img >= 24]):
        # non-crowd annotations encode label as inst_id // 1000; crowd
        # annotations carry the raw (<1000) label id
        label_id = int(inst_id) // 1000 if inst_id >= 1000 else int(inst_id)
        if label_id not in INSTANCE_IDS:
            continue
        iscrowd = int(inst_id < 1000)
        mask = np.asarray(inst_img == inst_id, np.uint8)
        rle = rle_encode(mask)
        anno_info.append(dict(
            iscrowd=iscrowd,
            category_id=label_id,
            bbox=rle_to_bbox(rle),
            area=float(rle_area(rle)),
            segmentation={"size": list(rle["size"]),
                          "counts": rle["counts"]}))
    video_name = osp.basename(osp.dirname(img_file))
    return dict(
        file_name=osp.join(video_name, osp.basename(img_file)),
        height=int(inst_img.shape[0]),
        width=int(inst_img.shape[1]),
        anno_info=anno_info,
        segm_file=osp.join(video_name, osp.basename(segm_file)))


def collect_files(img_dir: str, gt_dir: str):
    suffix = "leftImg8bit.png"
    files = []
    for img_file in sorted(glob.glob(osp.join(img_dir, "**/*.png"))):
        assert img_file.endswith(suffix), img_file
        stem = img_file[len(img_dir):-len(suffix)]
        files.append((img_file,
                      gt_dir + stem + "gtFine_instanceIds.png",
                      gt_dir + stem + "gtFine_labelIds.png"))
    assert files, f"No images found in {img_dir}"
    return files


def cvt_annotations(image_infos, out_json_name: str) -> dict:
    out = dict(images=[], categories=[], annotations=[])
    for label_id, name in INSTANCE_CLASSES:
        out["categories"].append(dict(id=label_id, name=name))
    img_id = 0
    ann_id = 0
    for info in image_infos:
        info = dict(info)
        annos = info.pop("anno_info")
        info["id"] = img_id
        out["images"].append(info)
        for anno in annos:
            anno = dict(anno, image_id=img_id, id=ann_id)
            out["annotations"].append(anno)
            ann_id += 1
        img_id += 1
    with open(out_json_name, "w") as f:
        json.dump(out, f)
    return out


def main():
    ap = argparse.ArgumentParser(
        description="Convert Cityscapes gtFine to COCO format (native)")
    ap.add_argument("cityscapes_path", help="cityscapes data root")
    ap.add_argument("--img-dir", default="leftImg8bit")
    ap.add_argument("--gt-dir", default="gtFine")
    ap.add_argument("-o", "--out-dir", default=None,
                    help="output dir (default: annotations/ under the root)")
    args = ap.parse_args()
    root = args.cityscapes_path
    out_dir = args.out_dir or osp.join(root, "annotations")
    os.makedirs(out_dir, exist_ok=True)
    for split, json_name in (("train", "instancesonly_filtered_gtFine_train.json"),
                             ("val", "instancesonly_filtered_gtFine_val.json"),
                             ("test", "instancesonly_filtered_gtFine_test.json")):
        img_dir = osp.join(root, args.img_dir, split)
        gt_dir = osp.join(root, args.gt_dir, split)
        if not osp.isdir(img_dir):
            print(f"skip {split}: {img_dir} not found")
            continue
        infos = [load_img_info(*f, img_dir=img_dir)
                 for f in collect_files(img_dir, gt_dir)]
        cvt_annotations(infos, osp.join(out_dir, json_name))
        print(f"{split}: {len(infos)} images ->",
              osp.join(out_dir, json_name))


if __name__ == "__main__":
    main()
