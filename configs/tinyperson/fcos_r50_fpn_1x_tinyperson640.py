# Non-adap FCOS TinyPerson baseline: STOCK strides (from 8) and regress
# ranges — the ablation row against the fpns4 "standard" Adap variant.
# Parity: TOV_mmdetection/configs2/TinyPerson/base/
# fcos_r50_caffe_fpn_gn-head_1x_TinyPerson640.py
_base_ = ["./fcos_r50_fpns4_1x_tinyperson640.py"]

INF = 1e8
model = dict(
    neck=dict(start_level=1),
    bbox_head=dict(
        strides=[8, 16, 32, 64, 128],
        regress_ranges=((-1, 64), (64, 128), (128, 256), (256, 512),
                        (512, INF))))
