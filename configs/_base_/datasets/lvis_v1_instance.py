# LVIS v1 dataset base (reference configs/_base_/datasets/lvis_v1_instance.py).
_base_ = ["./coco_instance.py"]
dataset_type = "LVISDataset"
data_root = "data/lvis_v1/"
data = dict(
    train=dict(_delete_=True, type=dataset_type,
               ann_file=data_root + "annotations/lvis_v1_train.json",
               img_prefix=data_root),
    val=dict(_delete_=True, type=dataset_type,
             ann_file=data_root + "annotations/lvis_v1_val.json",
             img_prefix=data_root),
    test=dict(_delete_=True, type=dataset_type,
              ann_file=data_root + "annotations/lvis_v1_val.json",
              img_prefix=data_root))
