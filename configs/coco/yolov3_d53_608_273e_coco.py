# YOLOv3 Darknet-53. Parity: reference
# configs/yolo/yolov3_d53_mstrain-608_273e_coco.py
_base_ = ["../_base_/datasets/coco_detection.py",
          "../_base_/schedules/schedule_1x.py",
          "../_base_/default_runtime.py"]
model = dict(
    type="YOLOV3",
    backbone=dict(type="Darknet", depth=53, out_indices=(3, 4, 5)),
    neck=dict(type="YOLOV3Neck", num_scales=3,
              in_channels=[1024, 512, 256], out_channels=[512, 256, 128]),
    bbox_head=dict(type="YOLOV3Head", num_classes=80,
                   in_channels=[512, 256, 128],
                   out_channels=[1024, 512, 256],
                   anchor_base_sizes=[[(116, 90), (156, 198), (373, 326)],
                                      [(30, 61), (62, 45), (59, 119)],
                                      [(10, 13), (16, 30), (33, 23)]],
                   featmap_strides=[32, 16, 8]))
test_cfg = dict(nms_pre=1000, max_per_img=100, score_thr=0.05,
                conf_thr=0.005, nms=dict(iou_threshold=0.45))
optimizer = dict(type="SGD", lr=1e-3, momentum=0.9, weight_decay=5e-4)
