# Adap FCOS on TinyPerson V2 (AP50 71.59 / AP50_tiny 60.98 ref).
_base_ = ["./faster_rcnn_r50_fpn_1x_tinypersonv2_640.py"]
model = dict(
    _delete_=True,
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
        loss_bbox=dict(type="IoULoss", loss_weight=1.0)))
train_cfg = dict(_delete_=True)
test_cfg = dict(
    _delete_=True,
    nms_pre=2000, score_thr=0.05,
    nms=dict(type="nms", iou_threshold=0.5), max_per_img=1000)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
