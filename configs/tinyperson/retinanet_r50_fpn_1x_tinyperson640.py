# Non-adap RetinaNet TinyPerson baseline: STOCK anchors/strides (octave 4,
# strides from 8) — the ablation row against the fpns4 Adap variant.
# Parity: TOV_mmdetection/configs2/TinyPerson/base/
# retinanet_r50_fpn_1x_TinyPerson640.py
_base_ = ["./retinanet_r50_fpns4_1x_tinyperson640.py"]

model = dict(
    neck=dict(start_level=1),
    bbox_head=dict(
        anchor_generator=dict(type="AnchorGenerator",
                              octave_base_scale=4,
                              scales_per_octave=3,
                              ratios=[0.5, 1.0, 2.0],
                              strides=[8, 16, 32, 64, 128])))
