# Parity: TOV_mmdetection/configs2/_base_/datasets/visDrone/
# visDronePerson_detection.py — full-resolution VisDrone-person training,
# untiled test, tiny-COCO IOD evaluation.
dataset_type = "CocoFmtDataset"
data_root = "data/visDrone/"
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
data = dict(
    samples_per_gpu=1,
    workers_per_gpu=1,
    train=[dict(
        type=dataset_type,
        ann_file=data_root + "coco_fmt_annotations/"
                 "VisDrone2018-DET-train-person.json",
        img_prefix=data_root + "VisDrone2018-DET-train/images",
        pipeline=train_pipeline)],
    val=dict(
        type=dataset_type,
        ann_file=data_root + "coco_fmt_annotations/"
                 "VisDrone2018-DET-val-person.json",
        img_prefix=data_root + "VisDrone2018-DET-val/images",
        pipeline=test_pipeline),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "coco_fmt_annotations/"
                 "VisDrone2018-DET-val-person.json",
        img_prefix=data_root + "VisDrone2018-DET-val/images",
        pipeline=test_pipeline),
)
# VisDrone frames are up to 2000x1500: bucket-pad by aspect group
loader = dict(max_gt=500, max_gt_ignore=100)

check = dict(stop_while_nan=True)

evaluation = dict(
    interval=1, metric="bbox",
    iou_thrs=[0.25, 0.5, 0.75],
    proposal_nums=[300],
    cocofmt_kwargs=dict(
        ignore_uncertain=True,
        use_ignore_attr=True,
        use_iod_for_ignore=True,
        iod_th_of_iou_f="lambda iou: (2*iou)/(1+iou)",
        cocofmt_param=dict(evaluate_standard="tiny"),
    ),
)
