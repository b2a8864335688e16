#!/usr/bin/env python
"""Convert PASCAL VOC XML annotations to a COCO-format json (reference
tools/dataset_converters/pascal_voc.py). Pure stdlib + numpy."""
import argparse
import json
import os.path as osp
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

VOC_CLASSES = ("aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
               "car", "cat", "chair", "cow", "diningtable", "dog", "horse",
               "motorbike", "person", "pottedplant", "sheep", "sofa",
               "train", "tvmonitor")


def convert(devkit: str, split_file: str, year: str, out: str):
    cat_map = {c: i + 1 for i, c in enumerate(VOC_CLASSES)}
    images, anns = [], []
    ann_id = 1
    with open(split_file) as f:
        ids = [l.strip() for l in f if l.strip()]
    for img_id, name in enumerate(ids, 1):
        xml_path = osp.join(devkit, f"VOC{year}", "Annotations",
                            f"{name}.xml")
        root = ET.parse(xml_path).getroot()
        size = root.find("size")
        images.append(dict(
            id=img_id, file_name=f"VOC{year}/JPEGImages/{name}.jpg",
            width=int(size.find("width").text),
            height=int(size.find("height").text)))
        for obj in root.findall("object"):
            cls = obj.find("name").text
            if cls not in cat_map:
                continue
            bb = obj.find("bndbox")
            x1 = float(bb.find("xmin").text) - 1
            y1 = float(bb.find("ymin").text) - 1
            x2 = float(bb.find("xmax").text) - 1
            y2 = float(bb.find("ymax").text) - 1
            difficult = int((obj.find("difficult").text
                             if obj.find("difficult") is not None else 0))
            anns.append(dict(
                id=ann_id, image_id=img_id, category_id=cat_map[cls],
                bbox=[x1, y1, x2 - x1, y2 - y1],
                area=(x2 - x1) * (y2 - y1), iscrowd=0,
                ignore=difficult, difficult=difficult))
            ann_id += 1
    cats = [dict(id=i, name=c) for c, i in cat_map.items()]
    with open(out, "w") as f:
        json.dump(dict(images=images, annotations=anns,
                       categories=cats), f)
    print(f"wrote {out}: {len(images)} images, {len(anns)} anns")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("devkit_path")
    p.add_argument("--split", required=True,
                   help="e.g. VOC2007/ImageSets/Main/trainval.txt")
    p.add_argument("--year", default="2007")
    p.add_argument("--out", required=True)
    args = p.parse_args()
    convert(args.devkit_path, osp.join(args.devkit_path, args.split),
            args.year, args.out)


if __name__ == "__main__":
    main()
