# P2P (P2PNet-style point localization) on TinyPersonV2, 640x640 tiles —
# stage-2 of the CPR -> result2ann -> P2P workflow.
# Parity: TOV_mmdetection/configs2/TinyPersonV2/p2p/
# p2p_r50_fpns4_1x_fl_sl1_TinyPersonV2_640.py
_base_ = ["../../tinyperson/p2p_r50_fpns4_1x_tinyperson640.py"]

dataset_type = "CocoFmtDataset"
data_root = "data/tiny_set_v2/"
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
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels"]),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="MultiScaleFlipAug",
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
# trained on CPR-refined (or center pseudo-wh) corner annotations
refined_ann = (data_root + "anns/release/corner/coarse/noise_rg-0-0.25_1/"
               "corner_w640_h640/pseuw16h16/"
               "rgb_train_w640h640ow100oh100_coarse.json")
data = dict(
    samples_per_gpu=2,
    train=dict(
        _delete_=True,
        type=dataset_type,
        min_gt_size=2,
        ann_file=refined_ann,
        img_prefix=data_root + "imgs/",
        pipeline=train_pipeline),
    val=dict(
        _delete_=True,
        type=dataset_type,
        ann_file=data_root + "anns/release/rgb_test.json",
        img_prefix=data_root + "imgs/",
        pipeline=test_pipeline),
    test=dict(
        _delete_=True,
        type=dataset_type,
        ann_file=data_root + "anns/release/rgb_test.json",
        img_prefix=data_root + "imgs/",
        pipeline=test_pipeline),
)
loader = dict(pad_shape=(640, 640), max_gt=200)

evaluation = dict(
    _delete_=True,
    interval=12, metric="bbox",
    do_first_eval=False, do_final_eval=True,
    use_location_metric=True,
    location_kwargs=dict(
        class_wise=False,
        matcher_kwargs=dict(multi_match_not_false_alarm=False),
        location_param=dict(matchThs=[0.5, 1.0, 2.0], maxDets=[1000])),
)
optimizer = dict(_delete_=True, type="Adam", lr=1e-4)
optimizer_config = dict(_delete_=True,
                        grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy="step", warmup="linear", warmup_iters=500,
                 warmup_ratio=0.001, step=[8, 11])
runner = dict(type="EpochBasedRunner", max_epochs=12)
find_unused_parameters = True
