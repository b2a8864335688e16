# WIDER Face dataset base (reference configs/_base_/datasets/wider_face.py).
dataset_type = "WIDERFaceDataset"
data_root = "data/WIDERFace/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(640, 640), keep_ratio=False),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels"]),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="NoAug", transforms=[
        dict(type="Resize", keep_ratio=True),
        dict(type="Normalize", **img_norm_cfg),
        dict(type="Pad", size_divisor=32),
        dict(type="Collect", keys=["img"]),
    ]),
]
data = dict(
    samples_per_gpu=8,
    train=dict(type=dataset_type,
               ann_file=data_root + "train.txt",
               img_prefix=data_root + "WIDER_train/",
               pipeline=train_pipeline),
    val=dict(type=dataset_type, ann_file=data_root + "val.txt",
             img_prefix=data_root + "WIDER_val/", pipeline=test_pipeline),
    test=dict(type=dataset_type, ann_file=data_root + "val.txt",
              img_prefix=data_root + "WIDER_val/", pipeline=test_pipeline),
)
loader = dict(pad_shape=None, size_divisor=32, max_gt=300)
evaluation = dict(interval=1, metric="mAP")
