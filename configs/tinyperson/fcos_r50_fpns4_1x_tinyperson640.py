# Adap FCOS TinyPerson baseline (AP50_tiny 47.61 ref).
# Parity: TOV_mmdetection/configs2/TinyPerson/base/
# fcos_standard_r50_caffe_fpns4_gn-head_1x_TinyPerson640.py — start_level=0,
# strides from 4, regress_ranges compressed for tiny objects.
_base_ = ["../_base_/datasets/tinyperson_640x512.py",
          "../_base_/schedules/schedule_1x.py",
          "../_base_/default_runtime.py"]

model = dict(
    type="SingleStageDetector",
    backbone=dict(type="ResNet", depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=0, add_extra_convs=True,
              relu_before_extra_convs=True, num_outs=5),
    bbox_head=dict(
        type="FCOSHead", num_classes=1, in_channels=256, feat_channels=256,
        stacked_convs=4, strides=[4, 8, 16, 32, 64],
        regress_ranges=((-1, 16), (16, 32), (32, 64), (64, 128), (128, 1e8)),
        norm_cfg=dict(type="GN", num_groups=32),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type="IoULoss", loss_weight=1.0),
        loss_centerness=dict(type="CrossEntropyLoss", use_sigmoid=True,
                             loss_weight=1.0)),
)
test_cfg = dict(nms_pre=2000, score_thr=0.05,
                nms=dict(type="nms", iou_threshold=0.5), max_per_img=1000)

optimizer = dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=0.0001,
                 paramwise_cfg=dict(bias_lr_mult=2.0, bias_decay_mult=0.0))
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy="step", warmup="constant", warmup_iters=500,
                 warmup_ratio=1.0 / 3, step=[8, 11])
