# Adap FoveaBox TinyPerson: shrunk-box assignment with compressed scale
# ranges mirroring the tiny recipe (strides from 4, base edges halved).
_base_ = ["../_base_/datasets/tinyperson_640x512.py",
          "../_base_/schedules/schedule_1x.py",
          "../_base_/default_runtime.py"]

model = dict(
    type="FoveaBox",
    backbone=dict(type="ResNet", depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=0, add_extra_convs="on_input",
              num_outs=5),
    bbox_head=dict(
        type="FoveaHead", num_classes=1, in_channels=256,
        feat_channels=256, stacked_convs=4,
        strides=[4, 8, 16, 32, 64],
        base_edge_list=[8, 16, 32, 64, 128],
        scale_ranges=((1, 32), (16, 64), (32, 128), (64, 256), (128, 512)),
        sigma=0.4,
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=1.5,
                      alpha=0.4, loss_weight=1.0),
        loss_bbox=dict(type="SmoothL1Loss", beta=0.11, loss_weight=1.0)),
)
train_cfg = dict()
test_cfg = dict(nms_pre=2000, score_thr=0.05,
                nms=dict(type="nms", iou_threshold=0.5), max_per_img=1000)
optimizer = dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=1, norm_type=2))
