# Res2Net Faster R-CNN. Parity: reference
# configs/res2net/faster_rcnn_r2_101_fpn_2x_coco.py
_base_ = ["./faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(_delete_=True, type="Res2Net", depth=101,
                           scales=4, base_width=26))
