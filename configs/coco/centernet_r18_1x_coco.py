# CenterNet (Objects as Points). Parity: reference configs/centernet.
_base_ = ["../_base_/default_runtime.py"]

model = dict(
    type="CenterNet",
    backbone=dict(type="ResNet", depth=18, num_stages=4,
                  out_indices=(3,), norm_eval=False),
    neck=dict(type="CTResNetNeck", in_channels=512,
              num_deconv_filters=[256, 128, 64]),
    bbox_head=dict(type="CenterNetHead", num_classes=80, in_channels=64,
                   feat_channels=64, stride=4),
)
train_cfg = dict()
test_cfg = dict(topk=100, score_thr=0.1)
optimizer = dict(type="SGD", lr=0.02, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy="step", warmup="linear", warmup_iters=1000,
                 warmup_ratio=0.001, step=[18, 24])
runner = dict(type="EpochBasedRunner", max_epochs=28)

# dataset
dataset_type = "CocoFmtDataset"
data_root = "data/coco/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(512, 512), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size=(512, 512)),
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
    samples_per_gpu=16,
    train=dict(type=dataset_type,
               ann_file=data_root + "annotations/instances_train2017.json",
               img_prefix=data_root + "train2017/",
               pipeline=train_pipeline),
    val=dict(type=dataset_type,
             ann_file=data_root + "annotations/instances_val2017.json",
             img_prefix=data_root + "val2017/", pipeline=test_pipeline),
    test=dict(type=dataset_type,
              ann_file=data_root + "annotations/instances_val2017.json",
              img_prefix=data_root + "val2017/", pipeline=test_pipeline),
)
loader = dict(pad_shape=(512, 512), max_gt=128)
