# Non-adap RepPoints with GN neck+head, stock strides.
# Parity: TOV_mmdetection/configs2/TinyPerson/base/
# reppoints_moment_r50_fpn_gn-neck+head_1x_TinyPerson640.py
_base_ = ["./reppoints_r50_fpns4_1x_tinyperson640.py"]

model = dict(
    neck=dict(start_level=1),
    bbox_head=dict(point_strides=[8, 16, 32, 64, 128]))
