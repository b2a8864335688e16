# Faster R-CNN with FPN_CARAFE neck. Parity: reference
# configs/carafe/faster_rcnn_r50_fpn_carafe_1x_coco.py
_base_ = ["../_base_/datasets/coco_detection.py",
          "../_base_/schedules/schedule_1x.py",
          "../_base_/default_runtime.py"]
model = dict(
    type="FasterRCNN",
    backbone=dict(type="ResNet", depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True),
    neck=dict(type="FPN_CARAFE", in_channels=[256, 512, 1024, 2048],
              out_channels=256, num_outs=5, start_level=0,
              upsample="carafe", up_kernel=5, up_group=1,
              encoder_kernel=3, encoder_dilation=1, compressed_channels=64),
    rpn_head=dict(
        type="RPNHead", num_classes=1, in_channels=256, feat_channels=256,
        anchor_generator=dict(type="AnchorGenerator", scales=[8],
                              ratios=[0.5, 1.0, 2.0],
                              strides=[4, 8, 16, 32, 64]),
        loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True),
        loss_bbox=dict(type="L1Loss")),
    roi_head=dict(
        type="StandardRoIHead",
        bbox_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=7, sampling_ratio=0),
            out_channels=256, featmap_strides=[4, 8, 16, 32]),
        bbox_head=dict(
            type="Shared2FCBBoxHead", num_classes=80, in_channels=256,
            fc_out_channels=1024, roi_feat_size=7,
            bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                            target_stds=[0.1, 0.1, 0.2, 0.2]),
            loss_cls=dict(type="CrossEntropyLoss"),
            loss_bbox=dict(type="L1Loss"))))
train_cfg = dict(
    rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                           neg_iou_thr=0.3, min_pos_iou=0.3),
             sampler=dict(type="RandomSampler", num=256, pos_fraction=0.5),
             allowed_border=-1, pos_weight=-1),
    rpn_proposal=dict(nms_pre=2000, max_per_img=1000,
                      nms=dict(iou_threshold=0.7)),
    rcnn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                            neg_iou_thr=0.5, min_pos_iou=0.5,
                            match_low_quality=False),
              sampler=dict(type="RandomSampler", num=512, pos_fraction=0.25,
                           add_gt_as_proposals=True),
              pos_weight=-1))
test_cfg = dict(rpn=dict(nms_pre=1000, max_per_img=1000,
                         nms=dict(iou_threshold=0.7)),
                rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                          max_per_img=100))
optimizer = dict(type="SGD", lr=0.02, momentum=0.9, weight_decay=0.0001)
