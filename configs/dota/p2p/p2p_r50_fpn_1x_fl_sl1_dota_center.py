# P2P on DOTA, trained on true box centers (upper-bound supervision),
# 1024x1024 tiles with runtime crop-merge test.
# Parity: TOV_mmdetection/configs2/DOTA/p2p/p2p_r50_fpn_1x_fl_sl1_DOTA_center.py
_base_ = ["../../tinyperson/p2p_r50_fpns4_1x_tinyperson640.py"]

dataset_type = "CocoFmtDataset"
data_root = "data/dota/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(1024, 1024), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="DefaultFormatBundle"),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels"]),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="CroppedTilesFlipAug",
         tile_shape=(1024, 1024),
         tile_overlap=(200, 200),
         scale_factor=[1.0],
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
        type=dataset_type,
        min_gt_size=2,
        ann_file=data_root + "DOTA-split/trainsplit/DOTA_train1024.json",
        img_prefix=data_root + "DOTA-split/trainsplit/images",
        pipeline=train_pipeline),
    val=dict(
        _delete_=True,
        type=dataset_type,
        ann_file=data_root + "DOTA-split/valsplit/DOTA_val1024.json",
        img_prefix=data_root + "DOTA-split/valsplit/images",
        pipeline=test_pipeline),
    test=dict(
        _delete_=True,
        type=dataset_type,
        ann_file=data_root + "DOTA-split/valsplit/DOTA_val1024.json",
        img_prefix=data_root + "DOTA-split/valsplit/images",
        pipeline=test_pipeline),
)
loader = dict(pad_shape=(1024, 1024), max_gt=500)

model = dict(bbox_head=dict(num_classes=15))

evaluation = dict(
    _delete_=True,
    interval=1, metric="bbox",
    do_first_eval=True,
    use_location_metric=True,
    location_kwargs=dict(
        class_wise=True,
        matcher_kwargs=dict(multi_match_not_false_alarm=False),
        location_param=dict(matchThs=[0.5, 1.0, 2.0], maxDets=[1000])),
)
optimizer = dict(_delete_=True, type="Adam", lr=1e-4)
optimizer_config = dict(_delete_=True,
                        grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy="step", warmup="linear", warmup_iters=500,
                 warmup_ratio=0.001, step=[8, 11])
runner = dict(type="EpochBasedRunner", max_epochs=12)
