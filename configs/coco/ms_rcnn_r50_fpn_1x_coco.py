# Mask Scoring R-CNN. Parity: reference configs/ms_rcnn/ms_rcnn_r50_fpn_1x_coco.py
_base_ = ["./mask_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    type="MaskScoringRCNN",
    roi_head=dict(type="MaskScoringRoIHead",
                  mask_iou_head=dict(num_convs=4, num_fcs=2,
                                     in_channels=256, conv_out_channels=256,
                                     fc_out_channels=1024)))
train_cfg = dict(rcnn=dict(mask_thr_binary=0.5))
