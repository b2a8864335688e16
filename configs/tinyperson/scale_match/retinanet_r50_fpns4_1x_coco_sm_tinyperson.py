# Scale Match pretraining for the Adap RetinaNet (fpns4, octave 2): COCO
# resized so object sizes follow TinyPerson's distribution; fine-tune on
# TinyPerson with load_from afterwards.
# Parity: TOV_mmdetection/configs2/TinyPerson/scale_match/
# retinanet_r50_fpns4_1x_coco_sm_tinyperson.py (+SM AP50_tiny 51.78).
_base_ = ["../retinanet_r50_fpns4_1x_tinyperson640.py"]

data_root_coco = "data/coco/"
tinyperson_dist_ann = ("data/tiny_set/mini_annotations/"
                       "tiny_set_train_all_erase.json")
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="ScaleMatchResize",
         scale_match_type="ScaleMatch",
         anno_file=tinyperson_dist_ann,
         bins=100,
         default_scale=0.25,
         scale_range=(0.1, 1.0)),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="DefaultFormatBundle"),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels"]),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="MultiScaleFlipAug",
         img_scale=(333, 200),
         flip=False,
         transforms=[
             dict(type="Resize", keep_ratio=True),
             dict(type="RandomFlip"),
             dict(type="Normalize", **img_norm_cfg),
             dict(type="Pad", size_divisor=32),
             dict(type="ImageToTensor", keys=["img"]),
             dict(type="Collect", keys=["img"]),
         ]),
]
data = dict(
    samples_per_gpu=4,
    train=dict(
        _delete_=True,
        type="CocoFmtDataset",
        ann_file=data_root_coco + "annotations/instances_train2017.json",
        img_prefix=data_root_coco + "images/",
        pipeline=train_pipeline),
    val=dict(
        _delete_=True,
        type="CocoFmtDataset",
        ann_file=data_root_coco + "annotations/instances_val2017.json",
        img_prefix=data_root_coco + "images/",
        pipeline=test_pipeline),
    test=dict(
        _delete_=True,
        type="CocoFmtDataset",
        ann_file=data_root_coco + "annotations/instances_val2017.json",
        img_prefix=data_root_coco + "images/",
        pipeline=test_pipeline),
)
# COCO has 80 classes during pretraining
model = dict(bbox_head=dict(num_classes=80))
loader = dict(pad_shape=(512, 640), max_gt=200)
evaluation = dict(_delete_=True, interval=1, metric="bbox")
optimizer = dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=0.0001)
