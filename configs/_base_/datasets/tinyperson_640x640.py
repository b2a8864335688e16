# Parity: TOV_mmdetection/configs2/_base_/datasets/TinyPerson/
# TinyPerson_detection_640x640.py — on-the-fly corner (640x640, overlap 100)
# generation from the full train json, runtime-tiled 640x640 test with
# tiny-COCO IOD evaluation.
dataset_type = "CocoFmtDataset"
data_root = "data/tiny_set/"
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
         keys=["img", "gt_bboxes", "gt_labels", "gt_bboxes_ignore"]),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="CroppedTilesFlipAug",
         tile_shape=(640, 640),
         tile_overlap=(100, 100),
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
    samples_per_gpu=1,
    workers_per_gpu=1,
    # reference uses data.train=[dict(...)] (a 1-element concat list) with
    # corner_kwargs tiling the full train json on the fly
    train=[dict(
        type=dataset_type,
        ann_file=data_root + "mini_annotations/tiny_set_train_all_erase.json",
        img_prefix=data_root + "erase_with_uncertain_dataset/train/",
        corner_kwargs=dict(sub_img_w=640, sub_img_h=640,
                           overlap_w=100, overlap_h=100,
                           keep_ratio_th=0.3),
        pipeline=train_pipeline,
    )],
    val=dict(
        type=dataset_type,
        ann_file=data_root + "mini_annotations/tiny_set_test_all.json",
        img_prefix=data_root + "test/",
        pipeline=test_pipeline),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "mini_annotations/tiny_set_test_all.json",
        img_prefix=data_root + "test/",
        pipeline=test_pipeline),
)
loader = dict(pad_shape=(640, 640), max_gt=200, max_gt_ignore=50)

check = dict(stop_while_nan=True)

evaluation = dict(
    interval=3, metric="bbox", tiled=True,
    iou_thrs=[0.25, 0.5, 0.75],
    proposal_nums=[200],
    cocofmt_kwargs=dict(
        ignore_uncertain=True,
        use_ignore_attr=True,
        use_iod_for_ignore=True,
        iod_th_of_iou_f="lambda iou: iou",
        cocofmt_param=dict(evaluate_standard="tiny"),
    ),
)
