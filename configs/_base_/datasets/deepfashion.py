# DeepFashion dataset base (reference configs/_base_/datasets/deepfashion.py).
_base_ = ["./coco_instance.py"]
dataset_type = "DeepFashionDataset"
data_root = "data/DeepFashion/In-shop/"
data = dict(
    train=dict(type=dataset_type,
               ann_file=data_root + "annotations/DeepFashion_segmentation_train.json",
               img_prefix=data_root + "Img/"),
    val=dict(type=dataset_type,
             ann_file=data_root + "annotations/DeepFashion_segmentation_query.json",
             img_prefix=data_root + "Img/"),
    test=dict(type=dataset_type,
              ann_file=data_root + "annotations/DeepFashion_segmentation_gallery.json",
              img_prefix=data_root + "Img/"))
