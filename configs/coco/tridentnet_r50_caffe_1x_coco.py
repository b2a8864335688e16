# TridentNet. Parity: reference
# configs/tridentnet/tridentnet_r50_caffe_1x_coco.py (C4 pathway)
_base_ = ["../_base_/datasets/coco_detection.py",
          "../_base_/schedules/schedule_1x.py",
          "../_base_/default_runtime.py"]
model = dict(
    type="TridentFasterRCNN",
    backbone=dict(type="TridentResNet", depth=50, base_channels=64,
                  out_indices=(3,), num_branch=3, test_branch_idx=1),
    rpn_head=dict(type="RPNHead", num_classes=1, in_channels=2048,
                  feat_channels=256,
                  anchor_generator=dict(type="AnchorGenerator",
                                        scales=[2, 4, 8, 16, 32],
                                        ratios=[0.5, 1.0, 2.0],
                                        strides=[16]),
                  loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True),
                  loss_bbox=dict(type="L1Loss")),
    roi_head=dict(
        type="StandardRoIHead",
        bbox_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=7,
                           sampling_ratio=0),
            out_channels=2048, featmap_strides=[16]),
        bbox_head=dict(type="Shared2FCBBoxHead", num_classes=80,
                       in_channels=2048, fc_out_channels=1024,
                       roi_feat_size=7,
                       bbox_coder=dict(target_stds=[0.1, 0.1, 0.2, 0.2]),
                       loss_cls=dict(type="CrossEntropyLoss"),
                       loss_bbox=dict(type="L1Loss"))))
train_cfg = dict(
    rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                           neg_iou_thr=0.3, min_pos_iou=0.3),
             sampler=dict(type="RandomSampler", num=256, pos_fraction=0.5)),
    rpn_proposal=dict(nms_pre=2000, max_per_img=1000,
                      nms=dict(iou_threshold=0.7)),
    rcnn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                            neg_iou_thr=0.5, min_pos_iou=0.5),
              sampler=dict(type="RandomSampler", num=512,
                           pos_fraction=0.25, add_gt_as_proposals=True)))
test_cfg = dict(rpn=dict(nms_pre=1000, max_per_img=1000,
                         nms=dict(iou_threshold=0.7)),
                rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                          max_per_img=100))
optimizer = dict(type="SGD", lr=0.02, momentum=0.9, weight_decay=0.0001)
