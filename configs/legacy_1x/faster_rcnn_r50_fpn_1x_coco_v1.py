# MMDet V1.x-compatible Faster R-CNN. Parity: reference
# configs/legacy_1.x/faster_rcnn_r50_fpn_1x_coco_v1.py
_base_ = ["../coco/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    rpn_head=dict(
        anchor_generator=dict(type="LegacyAnchorGenerator",
                              center_offset=0.5, scales=[8],
                              ratios=[0.5, 1.0, 2.0],
                              strides=[4, 8, 16, 32, 64]),
        bbox_coder=dict(type="LegacyDeltaXYWHBBoxCoder"),
        loss_bbox=dict(type="SmoothL1Loss", beta=1.0 / 9.0)),
    roi_head=dict(
        bbox_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=7,
                           sampling_ratio=2, aligned=False)),
        bbox_head=dict(
            bbox_coder=dict(type="LegacyDeltaXYWHBBoxCoder",
                            target_stds=[0.1, 0.1, 0.2, 0.2]),
            loss_bbox=dict(type="SmoothL1Loss", beta=1.0))))
train_cfg = dict(rpn_proposal=dict(max_per_img=2000),
                 rcnn=dict(assigner=dict(match_low_quality=True)))
