# GN Mask R-CNN. Parity: reference configs/gn/mask_rcnn_r50_fpn_gn-all_2x_coco.py
# (GroupNorm throughout head/neck; backbone GN is a documented deviation —
# the ResNet here keeps frozen BN, matching the benchmark's frozen-stage use)
_base_ = ["./mask_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    roi_head=dict(bbox_head=dict(norm_cfg=dict(type="GN", num_groups=32)),
                  mask_head=dict(norm_cfg=dict(type="GN", num_groups=32))))
