# ATSS R50-FPN 1x. Parity: reference configs/atss/atss_r50_fpn_1x_coco.py
_base_ = ["./retinanet_r50_fpn_1x_coco.py"]
model = dict(
    type="ATSS",
    bbox_head=dict(_delete_=True, type="ATSSHead", num_classes=80,
                   in_channels=256, feat_channels=256, stacked_convs=4,
                   anchor_generator=dict(type="AnchorGenerator", ratios=[1.0],
                                         octave_base_scale=8,
                                         scales_per_octave=1,
                                         strides=[8, 16, 32, 64, 128]),
                   bbox_coder=dict(target_means=[0, 0, 0, 0],
                                   target_stds=[0.1, 0.1, 0.2, 0.2])))
train_cfg = dict(_delete_=True, assigner=dict(type="ATSSAssigner", topk=9))
test_cfg = dict(nms=dict(iou_threshold=0.6))
