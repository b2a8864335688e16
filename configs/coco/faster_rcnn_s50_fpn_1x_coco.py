# ResNeSt Faster R-CNN. Parity: reference
# configs/resnest/faster_rcnn_s50_fpn_syncbn-backbone+head_mstrain-range_1x_coco.py
_base_ = ["./faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(_delete_=True, type="ResNeSt", depth=50,
                           radix=2, reduction_factor=4))
