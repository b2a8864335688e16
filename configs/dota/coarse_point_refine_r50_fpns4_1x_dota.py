# CPR on DOTA coarse points (1024 tiles).
# Parity: TOV_mmdetection/configs2/DOTA/coarsepointv2/
# coarse_point_refine_r50_fpns4_1x_DOTA_1024.py
_base_ = ["../cpr/coarse_point_refine_r50_fpns4_1x_coco.py"]

data_root = "data/dota/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", scale_factor=[1.0], keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="DefaultFormatBundle"),
    dict(type="Collect",
         keys=["img", "gt_bboxes", "gt_labels", "gt_bboxes_ignore",
               "gt_true_bboxes", "gt_anns_id"]),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", scale_factor=[1.0], keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.0),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="Collect",
         keys=["img", "gt_bboxes", "gt_labels", "gt_true_bboxes",
               "gt_anns_id"]),
]
data = dict(
    samples_per_gpu=2,
    train=dict(
        _delete_=True,
        type="CocoFmtDataset",
        ann_file=data_root + "annotations/train_1024.json",
        img_prefix=data_root + "images/",
        noise_kwargs=dict(pseudo_wh=(16, 16), noise_rg=0.25),
        pipeline=train_pipeline),
    val=dict(
        _delete_=True,
        type="CocoFmtDataset",
        ann_file=data_root + "annotations/val_1024.json",
        img_prefix=data_root + "images/",
        noise_kwargs=dict(pseudo_wh=(16, 16), noise_rg=0.25),
        pipeline=test_pipeline),
    test=dict(
        _delete_=True,
        type="CocoFmtDataset",
        ann_file=data_root + "annotations/val_1024.json",
        img_prefix=data_root + "images/",
        noise_kwargs=dict(pseudo_wh=(16, 16), noise_rg=0.25),
        pipeline=test_pipeline),
)
loader = dict(pad_shape=(1024, 1024), max_gt=400)
model = dict(bbox_head=dict(num_classes=15))
