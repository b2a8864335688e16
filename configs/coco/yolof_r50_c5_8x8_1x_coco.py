# YOLOF (You Only Look One-level Feature). Parity: reference configs/yolof.
_base_ = ["../_base_/datasets/coco_detection.py",
          "../_base_/schedules/schedule_1x.py",
          "../_base_/default_runtime.py"]
model = dict(
    type="YOLOF",
    backbone=dict(type="ResNet", depth=50, num_stages=4, out_indices=(3,),
                  frozen_stages=1, norm_eval=True),
    neck=dict(type="DilatedEncoder", in_channels=2048, out_channels=512,
              block_mid_channels=128, num_residual_blocks=4),
    bbox_head=dict(type="YOLOFHead", num_classes=80, in_channels=512,
                   num_cls_convs=2, num_reg_convs=4, stride=32,
                   anchor_scales=[1, 2, 4, 8, 16], match_times=4,
                   pos_ignore_thr=0.15, neg_ignore_thr=0.7),
)
train_cfg = dict()
test_cfg = dict(nms_pre=1000, score_thr=0.05,
                nms=dict(type="nms", iou_threshold=0.6), max_per_img=100)
optimizer = dict(type="SGD", lr=0.12, momentum=0.9, weight_decay=0.0001,
                 paramwise_cfg=dict(
                     custom_keys={"backbone": dict(lr_mult=1.0 / 3)}))
