# Cityscapes detection base (reference configs/_base_/datasets/
# cityscapes_detection.py) — COCO-format annotations.
_base_ = ["./coco_detection.py"]
dataset_type = "CityscapesDataset"
data_root = "data/cityscapes/"
data = dict(
    train=dict(type=dataset_type,
               ann_file=data_root
               + "annotations/instancesonly_filtered_gtFine_train.json",
               img_prefix=data_root + "leftImg8bit/train/"),
    val=dict(type=dataset_type,
             ann_file=data_root
             + "annotations/instancesonly_filtered_gtFine_val.json",
             img_prefix=data_root + "leftImg8bit/val/"),
    test=dict(type=dataset_type,
              ann_file=data_root
              + "annotations/instancesonly_filtered_gtFine_val.json",
              img_prefix=data_root + "leftImg8bit/val/"))
