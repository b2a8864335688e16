# Fast R-CNN (precomputed proposals). Parity: reference
# configs/fast_rcnn/fast_rcnn_r50_fpn_1x_coco.py
_base_ = ["./faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(_delete_=True,
             type="FastRCNN",
             backbone=dict(type="ResNet", depth=50, num_stages=4,
                           out_indices=(0, 1, 2, 3), frozen_stages=1),
             neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
                       out_channels=256, start_level=0, num_outs=5),
             roi_head=dict(
                 type="StandardRoIHead",
                 bbox_roi_extractor=dict(
                     roi_layer=dict(type="RoIAlign", output_size=7,
                                    sampling_ratio=0),
                     out_channels=256, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(type="Shared2FCBBoxHead", num_classes=80,
                                in_channels=256, fc_out_channels=1024,
                                roi_feat_size=7,
                                bbox_coder=dict(
                                    target_stds=[0.1, 0.1, 0.2, 0.2]),
                                loss_cls=dict(type="CrossEntropyLoss"),
                                loss_bbox=dict(type="L1Loss"))))
