# CPR with a ResNet-101 backbone on COCO-400 points.
# Parity: TOV_mmdetection/configs2/COCO/coarsepointv2/
# coarse_point_refine_r101_fpn_1x_coco400.py
_base_ = ["./coarse_point_refine_r50_fpns4_1x_coco.py"]

model = dict(backbone=dict(depth=101))
