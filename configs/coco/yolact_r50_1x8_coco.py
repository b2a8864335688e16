# YOLACT R50. Parity: reference configs/yolact/yolact_r50_1x8_coco.py
_base_ = ["./retinanet_r50_fpn_1x_coco.py",
          "../_base_/datasets/coco_instance.py"]
model = dict(
    _delete_=True,
    type="YOLACT",
    backbone=dict(type="ResNet", depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=1, add_extra_convs="on_input",
              num_outs=5),
    bbox_head=dict(type="YOLACTHead", num_classes=80, in_channels=256,
                   feat_channels=256, num_protos=32,
                   anchor_generator=dict(type="AnchorGenerator",
                                         octave_base_scale=3,
                                         scales_per_octave=1,
                                         ratios=[0.5, 1.0, 2.0],
                                         strides=[8, 16, 32, 64, 128]),
                   bbox_coder=dict(target_means=[0, 0, 0, 0],
                                   target_stds=[0.1, 0.1, 0.2, 0.2])))
train_cfg = dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                               neg_iou_thr=0.4, min_pos_iou=0.0))
test_cfg = dict(nms_pre=1000, max_per_img=100, score_thr=0.05,
                nms=dict(iou_threshold=0.5))
