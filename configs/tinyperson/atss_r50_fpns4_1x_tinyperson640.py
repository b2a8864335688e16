# Adap ATSS TinyPerson. Parity: reference mmdet configs/atss adapted with
# the fork's tiny recipe (FPN start_level=0, strides from 4, num_classes=1).
_base_ = ["../_base_/datasets/tinyperson_640x512.py",
          "../_base_/schedules/schedule_1x.py",
          "../_base_/default_runtime.py"]

model = dict(
    type="SingleStageDetector",
    backbone=dict(type="ResNet", depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=0, add_extra_convs="on_input",
              num_outs=5),
    bbox_head=dict(
        type="ATSSHead", num_classes=1, in_channels=256,
        feat_channels=256, stacked_convs=4,
        anchor_generator=dict(type="AnchorGenerator",
                              octave_base_scale=4, scales_per_octave=1,
                              ratios=[1.0], strides=[4, 8, 16, 32, 64]),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0, 0, 0, 0],
                        target_stds=[0.1, 0.1, 0.2, 0.2]),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type="GIoULoss", loss_weight=2.0)),
)
train_cfg = dict(assigner=dict(type="ATSSAssigner", topk=9),
                 allowed_border=-1, pos_weight=-1)
test_cfg = dict(nms_pre=2000, score_thr=0.05,
                nms=dict(type="nms", iou_threshold=0.6), max_per_img=1000)
optimizer = dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=1, norm_type=2))
