# Standalone RPN. Parity: reference configs/rpn/rpn_r50_fpn_1x_coco.py
_base_ = ["./faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(_delete_=True,
             type="RPN",
             backbone=dict(type="ResNet", depth=50, num_stages=4,
                           out_indices=(0, 1, 2, 3), frozen_stages=1),
             neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
                       out_channels=256, start_level=0, num_outs=5),
             rpn_head=dict(type="RPNHead", num_classes=1, in_channels=256,
                           feat_channels=256,
                           anchor_generator=dict(type="AnchorGenerator",
                                                 scales=[8],
                                                 ratios=[0.5, 1.0, 2.0],
                                                 strides=[4, 8, 16, 32, 64]),
                           loss_cls=dict(type="CrossEntropyLoss",
                                         use_sigmoid=True),
                           loss_bbox=dict(type="L1Loss")))
evaluation = dict(interval=1, metric="proposal_fast")
