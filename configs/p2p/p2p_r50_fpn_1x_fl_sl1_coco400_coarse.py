# P2P on COCO-400 coarse points (pseudo 16x16 noise boxes), FPN start
# level 1 (stride 8, single level) at 667x400 input.
# Parity: TOV_mmdetection/configs2/COCO/p2p/
# p2p_r50_fpn_1x_fl_sl1_coco400_coarse.py
_base_ = ["./p2p_r50_fpns4_1x_coco.py"]

data_root = "data/coco/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(667, 400), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="DefaultFormatBundle"),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels"]),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="MultiScaleFlipAug",
         img_scale=(667, 400),
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
    train=dict(
        ann_file=(data_root + "coarse_gen_annotations/"
                  "noise_rg-0-0-0.25-0.25_1/pseuw16h16/"
                  "instances_train2017_coarse.json"),
        pipeline=train_pipeline),
    val=dict(pipeline=test_pipeline),
    test=dict(pipeline=test_pipeline),
)
loader = dict(pad_shape=(416, 672), max_gt=100)

# stride-8 single level (fpn start_level 1), vs fpns4's stride-4
model = dict(neck=dict(start_level=1),
             bbox_head=dict(strides=[8]))
