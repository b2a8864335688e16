# Faster R-CNN with Feature Pyramid Grids. Parity: reference
# configs/fpg/faster_rcnn_r50_fpg_crop640_50e_coco.py
_base_ = ["./faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    neck=dict(_delete_=True, type="FPG",
              in_channels=[256, 512, 1024, 2048], out_channels=256,
              num_outs=5, stack_times=9, inter_channels=256,
              skip_inds=[[0, 1, 2, 3], [0, 1, 2], [0, 1], [0], []]))
