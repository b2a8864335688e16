# Empirical attention Faster R-CNN. Parity: reference
# configs/empirical_attention/faster_rcnn_r50_fpn_attention_1111_1x_coco.py
_base_ = ["./faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(
    plugins=[dict(cfg=dict(type="GeneralizedAttention", num_heads=8,
                           kv_stride=2),
                  stages=(False, False, True, True),
                  position="after_conv2")]))
