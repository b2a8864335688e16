# Non-adap RepPoints TinyPerson baselines: stock strides (from 8), plain
# neck/head (no GN) — reference has both the plain and gn-neck+head rows.
# Parity: TOV_mmdetection/configs2/TinyPerson/base/
# reppoints_moment_r50_fpn_1x_TinyPerson640.py
_base_ = ["./reppoints_r50_fpns4_1x_tinyperson640.py"]

model = dict(
    neck=dict(start_level=1, norm_cfg=None),
    bbox_head=dict(point_strides=[8, 16, 32, 64, 128], norm_cfg=None))
