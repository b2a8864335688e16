# RetinaNet R50-FPN 1x. Parity: reference
# configs/retinanet/retinanet_r50_fpn_1x_coco.py
_base_ = ["../_base_/datasets/coco_detection.py",
          "../_base_/schedules/schedule_1x.py",
          "../_base_/default_runtime.py"]
model = dict(
    type="RetinaNet",
    backbone=dict(type="ResNet", depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=1, add_extra_convs="on_input",
              num_outs=5),
    bbox_head=dict(
        type="RetinaHead", num_classes=80, in_channels=256,
        feat_channels=256, stacked_convs=4,
        anchor_generator=dict(type="AnchorGenerator", octave_base_scale=4,
                              scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                              strides=[8, 16, 32, 64, 128]),
        bbox_coder=dict(target_means=[0, 0, 0, 0],
                        target_stds=[1, 1, 1, 1]),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25),
        loss_bbox=dict(type="L1Loss")))
train_cfg = dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                               neg_iou_thr=0.4, min_pos_iou=0.0),
                 allowed_border=-1, pos_weight=-1)
test_cfg = dict(nms_pre=1000, max_per_img=100, score_thr=0.05,
                nms=dict(iou_threshold=0.5))
optimizer = dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=0.0001)
