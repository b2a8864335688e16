"""PASCAL VOC (XML) dataset.

Parity target: mmdet datasets/voc.py + xml_style.py — XML annotation
parsing, `difficult` handled as ignore, VOC-style eval delegated to the
COCO-format evaluator by converting on the fly.
"""
from __future__ import annotations

import os.path as osp
import xml.etree.ElementTree as ET
from typing import List, Optional, Sequence

import numpy as np

from ..utils.registry import DATASETS
from .transforms import Compose

__all__ = ["VOCDataset", "WIDERFaceDataset"]

VOC_CLASSES = ("aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
               "car", "cat", "chair", "cow", "diningtable", "dog", "horse",
               "motorbike", "person", "pottedplant", "sheep", "sofa",
               "train", "tvmonitor")


@DATASETS.register_module()
class VOCDataset:
    CLASSES = VOC_CLASSES

    def __init__(self, ann_file: str, pipeline: Sequence[dict],
                 img_prefix: str = "", img_subdir: str = "JPEGImages",
                 ann_subdir: str = "Annotations",
                 classes: Optional[Sequence[str]] = None,
                 test_mode: bool = False, min_size: Optional[float] = None,
                 seed: int = 0):
        self.img_prefix = img_prefix
        self.img_subdir = img_subdir
        self.ann_subdir = ann_subdir
        self.classes = list(classes) if classes else list(self.CLASSES)
        self.cat2label = {c: i for i, c in enumerate(self.classes)}
        self.test_mode = test_mode
        self.min_size = min_size
        self.seed = seed
        self._epoch = 0
        with open(ann_file) as f:
            self.img_ids = [line.strip() for line in f if line.strip()]
        self.data_infos = self._load_infos()
        self.flag = np.zeros(len(self.data_infos), np.uint8)
        for i, info in enumerate(self.data_infos):
            if info["width"] / max(info["height"], 1) > 1:
                self.flag[i] = 1
        self.pipeline = Compose(pipeline)

    def _load_infos(self) -> List[dict]:
        infos = []
        for img_id in self.img_ids:
            xml_path = osp.join(self.img_prefix, self.ann_subdir,
                                f"{img_id}.xml")
            width = height = 0
            if osp.exists(xml_path):
                root = ET.parse(xml_path).getroot()
                size = root.find("size")
                if size is not None:
                    width = int(size.find("width").text)
                    height = int(size.find("height").text)
            infos.append(dict(
                id=img_id, filename=osp.join(self.img_subdir,
                                             f"{img_id}.jpg"),
                file_name=osp.join(self.img_subdir, f"{img_id}.jpg"),
                width=width, height=height))
        return infos

    def __len__(self):
        return len(self.data_infos)

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def get_ann_info(self, idx: int) -> dict:
        img_id = self.data_infos[idx]["id"]
        xml_path = osp.join(self.img_prefix, self.ann_subdir,
                            f"{img_id}.xml")
        bboxes, labels, bboxes_ignore = [], [], []
        if osp.exists(xml_path):
            root = ET.parse(xml_path).getroot()
            for obj in root.findall("object"):
                name = obj.find("name").text
                if name not in self.cat2label:
                    continue
                difficult = int(obj.find("difficult").text
                                if obj.find("difficult") is not None else 0)
                bb = obj.find("bndbox")
                box = [float(bb.find(k).text) - (1 if k.startswith(("xmi",
                                                                    "ymi"))
                                                 else 0)
                       for k in ("xmin", "ymin", "xmax", "ymax")]
                w, h = box[2] - box[0], box[3] - box[1]
                ignore = difficult or (self.min_size and
                                       (w < self.min_size
                                        or h < self.min_size))
                if ignore:
                    bboxes_ignore.append(box)
                else:
                    bboxes.append(box)
                    labels.append(self.cat2label[name])
        return dict(
            bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int64),
            anns_id=np.arange(len(bboxes), dtype=np.int64),
            bboxes_ignore=np.asarray(bboxes_ignore,
                                     np.float32).reshape(-1, 4))

    def __getitem__(self, idx: int):
        results = dict(
            img_info=self.data_infos[idx],
            ann_info=self.get_ann_info(idx),
            img_prefix=self.img_prefix,
            bbox_fields=[],
            _rng=np.random.RandomState(
                (self.seed * 1_000_003 + self._epoch * 10_007 + idx)
                % (2 ** 31)),
        )
        return self.pipeline(results)

    def evaluate(self, results, metric="mAP", iou_thr=0.5, **kwargs):
        """VOC mAP via the COCO-format evaluator (converted on the fly)."""
        from .coco import COCO
        from ..evaluation.cocoeval import COCOExpandEval
        images, annotations, ann_id = [], [], 1
        for i, info in enumerate(self.data_infos):
            images.append(dict(id=i + 1, file_name=info["file_name"],
                               width=info["width"], height=info["height"]))
            ann = self.get_ann_info(i)
            for b, l in zip(ann["bboxes"], ann["labels"]):
                annotations.append(dict(
                    id=ann_id, image_id=i + 1, category_id=int(l) + 1,
                    bbox=[float(b[0]), float(b[1]),
                          float(b[2] - b[0]), float(b[3] - b[1])],
                    area=float((b[2] - b[0]) * (b[3] - b[1])), iscrowd=0))
                ann_id += 1
        gt = COCO(dict(images=images, annotations=annotations,
                       categories=[dict(id=i + 1, name=c)
                                   for i, c in enumerate(self.classes)]))
        dets = []
        for i, res in enumerate(results):
            for bb, lb in zip(np.asarray(res["bboxes"]),
                              np.asarray(res["labels"])):
                dets.append(dict(image_id=i + 1, category_id=int(lb) + 1,
                                 bbox=[float(bb[0]), float(bb[1]),
                                       float(bb[2] - bb[0]),
                                       float(bb[3] - bb[1])],
                                 score=float(bb[4])))
        ev = COCOExpandEval(gt, gt.loadRes(dets), "bbox",
                            cocofmt_param=dict(iouThrs=[iou_thr],
                                               maxDets=[100]))
        ev.evaluate()
        ev.accumulate()
        return ev.summarize()


@DATASETS.register_module()
class WIDERFaceDataset(VOCDataset):
    """WIDER Face in PASCAL-VOC XML layout (reference
    mmdet/datasets/wider_face.py — single 'face' class; image paths keep
    the WIDER event-folder prefix)."""
    CLASSES = ("face",)
