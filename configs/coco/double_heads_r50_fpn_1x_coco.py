# Double-Head R-CNN. Parity: reference
# configs/double_heads/dh_faster_rcnn_r50_fpn_1x_coco.py
_base_ = ["./faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    type="DoubleHeadRCNN",
    roi_head=dict(
        bbox_head=dict(_delete_=True, type="DoubleConvFCBBoxHead",
                       num_classes=80, in_channels=256,
                       conv_out_channels=1024, fc_out_channels=1024,
                       num_convs=4, num_fcs=2, reg_class_agnostic=False,
                       roi_feat_size=7,
                       bbox_coder=dict(target_stds=[0.1, 0.1, 0.2, 0.2]),
                       loss_cls=dict(type="CrossEntropyLoss",
                                     loss_weight=2.0),
                       loss_bbox=dict(type="SmoothL1Loss", beta=1.0,
                                      loss_weight=2.0))))
