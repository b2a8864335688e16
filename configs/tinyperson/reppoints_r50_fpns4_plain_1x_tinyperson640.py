# Adap RepPoints WITHOUT GN (plain neck/head), strides from 4 — the
# reference's reppoints_moment_r50_fpns4_1x row.
# Parity: TOV_mmdetection/configs2/TinyPerson/base/
# reppoints_moment_r50_fpns4_1x_TinyPerson640.py
_base_ = ["./reppoints_r50_fpns4_1x_tinyperson640.py"]

model = dict(
    neck=dict(norm_cfg=None),
    bbox_head=dict(norm_cfg=None))
