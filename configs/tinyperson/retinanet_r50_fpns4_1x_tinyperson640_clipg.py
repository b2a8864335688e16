# Adap RetinaNet "-c" (grad-clip) variant (AP50_tiny 45.22 ref; the
# clip variant stabilizes tiny-object focal training).
# Parity: TOV_mmdetection/configs2/TinyPerson/base/
# retinanet_r50_fpns4_1x_TinyPerson640_clipg.py — identical model, plus
# optimizer_config grad_clip max_norm=1.
_base_ = ["./retinanet_r50_fpns4_1x_tinyperson640.py"]
optimizer_config = dict(grad_clip=dict(max_norm=1, norm_type=2))
