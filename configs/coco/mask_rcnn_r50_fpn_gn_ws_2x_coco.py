# GN+WS Mask R-CNN. Parity: reference
# configs/gn+ws/mask_rcnn_r50_fpn_gn_ws-all_2x_coco.py — backbone 3x3 convs
# weight-standardized + GN heads (backbone norm stays frozen BN per the
# detection-finetune convention used throughout this zoo).
_base_ = ["./mask_rcnn_r50_fpn_gn_all_2x_coco.py"]
model = dict(backbone=dict(conv_ws=True))
