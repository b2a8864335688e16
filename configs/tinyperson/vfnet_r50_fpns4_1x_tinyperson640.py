# Adap VFNet TinyPerson: IoU-aware varifocal training, strides from 4.
_base_ = ["../_base_/datasets/tinyperson_640x512.py",
          "../_base_/schedules/schedule_1x.py",
          "../_base_/default_runtime.py"]

model = dict(
    type="VFNet",
    backbone=dict(type="ResNet", depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=0, add_extra_convs="on_input",
              num_outs=5),
    bbox_head=dict(
        type="VFNetHead", num_classes=1, in_channels=256,
        feat_channels=256, stacked_convs=3,
        strides=[4, 8, 16, 32, 64], anchor_scale=8, atss_topk=9,
        norm_cfg=dict(type="GN", num_groups=32),
        loss_cls=dict(type="VarifocalLoss", use_sigmoid=True, alpha=0.75,
                      gamma=2.0, iou_weighted=True, loss_weight=1.0),
        loss_bbox=dict(type="GIoULoss", loss_weight=1.5),
        loss_bbox_refine=dict(type="GIoULoss", loss_weight=2.0)),
)
train_cfg = dict()
test_cfg = dict(nms_pre=2000, score_thr=0.05,
                nms=dict(type="nms", iou_threshold=0.6), max_per_img=1000)
optimizer = dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=0.0001,
                 paramwise_cfg=dict(bias_lr_mult=2.0, bias_decay_mult=0.0))
optimizer_config = dict(grad_clip=dict(max_norm=1, norm_type=2))
