# P2PNet-style point localization on COCO.
# Parity: TOV_mmdetection/configs2/COCO/p2p/p2p_r50_fpns4_1x_fl_sl1_coco.py
_base_ = ["../_base_/default_runtime.py"]

norm_cfg = dict(type="GN", num_groups=32)

dataset_type = "CocoFmtDataset"
data_root = "data/coco/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="DefaultFormatBundle"),
    dict(type="Collect",
         keys=["img", "gt_bboxes", "gt_labels", "gt_bboxes_ignore"]),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="NoAug",
         transforms=[
             dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
             dict(type="Normalize", **img_norm_cfg),
             dict(type="Pad", size_divisor=32),
             dict(type="Collect", keys=["img"]),
         ]),
]
data = dict(
    samples_per_gpu=8,
    train=dict(type=dataset_type,
               ann_file=data_root + "annotations/instances_train2017.json",
               img_prefix=data_root + "images/",
               pipeline=train_pipeline,
               min_gt_size=2),
    val=dict(type=dataset_type,
             ann_file=data_root + "annotations/instances_val2017.json",
             img_prefix=data_root + "images/",
             pipeline=test_pipeline),
    test=dict(type=dataset_type,
              ann_file=data_root + "annotations/instances_val2017.json",
              img_prefix=data_root + "images/",
              pipeline=test_pipeline),
)
loader = dict(pad_shape=(800, 1344), max_gt=200)

check = dict(stop_while_nan=False)

model = dict(
    type="BasicLocator",
    backbone=dict(type="ResNet", depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=0, add_extra_convs="on_input",
              num_outs=1),
    bbox_head=dict(
        type="P2PHead", num_classes=80, in_channels=256, feat_channels=256,
        stacked_convs=4, strides=[4], point_anchor=[(0.0, 0.0)],
        norm_cfg=norm_cfg,
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_reg=dict(type="SmoothL1Loss", beta=1.0 / 9.0, loss_weight=0.5),
        pts_gamma=1, reg_norm=1),
)
train_cfg = dict(
    neg_weight=1.0,
    assigner=dict(type="HungarianAssignerV2",
                  cls_costs=dict(type="FocalLossCost", weight=2.0),
                  reg_costs=dict(type="DisCostV2", weight=0.1,
                                 norm_with_img_wh=False),
                  topk_k=5),
    sampler=dict(type="PseudoSampler"))
test_cfg = dict(nms_pre=1000, min_bbox_size=0, score_thr=0.05,
                pseudo_wh=(32, 32), nms=dict(type="nms", iou_threshold=0.01),
                max_per_img=100)

evaluation = dict(
    interval=1, metric="bbox",
    use_location_metric=True,
    location_kwargs=dict(
        matcher_kwargs=dict(multi_match_not_false_alarm=False),
        location_param=dict(matchThs=[0.5, 1.0, 2.0], maxDets=[100])),
)

optimizer = dict(type="Adam", lr=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy="step", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, step=[8, 11])
runner = dict(type="EpochBasedRunner", max_epochs=12)
