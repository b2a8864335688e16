# P2P with a ResNet-101 backbone on COCO-400 coarse points.
# Parity: TOV_mmdetection/configs2/COCO/p2p/
# p2p_r101_fpn_1x_fl_sl1_coco400_coarse.py
_base_ = ["./p2p_r50_fpn_1x_fl_sl1_coco400_coarse.py"]

model = dict(backbone=dict(depth=101))
