# SSD300. Parity: reference configs/ssd/ssd300_coco.py
_base_ = ["../_base_/datasets/coco_detection.py",
          "../_base_/schedules/schedule_1x.py",
          "../_base_/default_runtime.py"]
model = dict(
    type="SSD",
    backbone=dict(type="SSDVGG", input_size=300, depth=16,
                  out_indices=(3, 4)),
    bbox_head=dict(
        type="SSDHead", num_classes=80,
        in_channels=(512, 1024, 512, 256, 256, 256),
        anchor_generator=dict(
            type="SSDAnchorGenerator", scale_major=False, input_size=300,
            basesize_ratio_range=(0.15, 0.9),
            strides=[8, 16, 32, 64, 100, 300],
            ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]]),
        bbox_coder=dict(target_means=[0.0, 0.0, 0.0, 0.0],
                        target_stds=[0.1, 0.1, 0.2, 0.2])))
train_cfg = dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                               neg_iou_thr=0.5, min_pos_iou=0.0,
                               match_low_quality=True,
                               gt_max_assign_all=False))
test_cfg = dict(nms_pre=1000, max_per_img=200, score_thr=0.02,
                nms=dict(iou_threshold=0.45))
optimizer = dict(type="SGD", lr=2e-3, momentum=0.9, weight_decay=5e-4)
