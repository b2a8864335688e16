# Scale Match pretraining: COCO resized so its object-size distribution
# matches TinyPerson's, then fine-tune on TinyPerson with load_from.
# Parity: TOV_mmdetection/configs2/TinyPerson/scale_match/
# faster_rcnn_r50_fpn_1x_coco_sm_tinyperson.py (+SM gives AP50_tiny 50.85).
_base_ = ["../faster_rcnn_r50_fpn_1x_tinyperson640.py"]

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
    dict(type="Collect",
         keys=["img", "gt_bboxes", "gt_labels", "gt_bboxes_ignore"]),
]
data = dict(
    samples_per_gpu=8,
    train=dict(
        _delete_=True,
        type="CocoFmtDataset",
        ann_file=data_root_coco + "annotations/instances_train2017.json",
        img_prefix=data_root_coco + "images/",
        pipeline=train_pipeline),
)
loader = dict(pad_shape=(512, 640), max_gt=200)
# MSM variant: swap ScaleMatchResize for
# dict(type="ScaleMatchResize", scale_match_type="MonotonicityScaleMatch",
#      src_anno_file=<coco train json>, dst_anno_file=tinyperson_dist_ann)
