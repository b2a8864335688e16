# Faster R-CNN on TinyPerson V2 / SeaPerson (AP50 73.44 / AP50_tiny 60.78 ref)
# Parity: TOV_mmdetection/configs2/TinyPersonV2/base/
# faster_rcnn_r50_fpn_1x_TinyPersonV2_640.py — train on 640x640 corner tiles
# generated on the fly, tiled test.
_base_ = ["../tinyperson/faster_rcnn_r50_fpn_1x_tinyperson640.py"]

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
    dict(type="Collect",
         keys=["img", "gt_bboxes", "gt_labels", "gt_bboxes_ignore"]),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="CroppedTilesFlipAug", tile_shape=(640, 640),
         tile_overlap=(100, 100), scale_factor=[1.0], flip=False,
         transforms=[
             dict(type="Resize", keep_ratio=True),
             dict(type="RandomFlip"),
             dict(type="Normalize", **img_norm_cfg),
             dict(type="Pad", size_divisor=32),
             dict(type="Collect", keys=["img"]),
         ]),
]
data = dict(
    samples_per_gpu=4,
    train=dict(
        _delete_=True,
        type="CocoFmtDataset",
        ann_file=data_root + "anns/release/rgb_train.json",
        img_prefix=data_root,
        # on-the-fly corner (tile) dataset generation, 640x640
        corner_kwargs=dict(sub_img_w=640, sub_img_h=640,
                           overlap_w=100, overlap_h=100),
        pipeline=train_pipeline),
    val=dict(
        _delete_=True,
        type="CocoFmtDataset",
        ann_file=data_root + "anns/release/rgb_test.json",
        img_prefix=data_root,
        pipeline=test_pipeline),
    test=dict(
        _delete_=True,
        type="CocoFmtDataset",
        ann_file=data_root + "anns/release/rgb_test.json",
        img_prefix=data_root,
        pipeline=test_pipeline),
)
loader = dict(pad_shape=(640, 640), max_gt=200)
optimizer = dict(type="SGD", lr=0.04, momentum=0.9, weight_decay=0.0001)
