# Faster R-CNN R50-FPN 1x. Parity: reference
# configs/faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py
_base_ = ["./faster_rcnn_r50_fpn_carafe_1x_coco.py"]
model = dict(
    neck=dict(_delete_=True, type="FPN",
              in_channels=[256, 512, 1024, 2048], out_channels=256,
              start_level=0, num_outs=5))
