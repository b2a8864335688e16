# PISA Faster R-CNN. Parity: reference
# configs/pisa/pisa_faster_rcnn_r50_fpn_1x_coco.py
_base_ = ["./faster_rcnn_r50_fpn_carafe_1x_coco.py"]
model = dict(
    neck=dict(_delete_=True, type="FPN",
              in_channels=[256, 512, 1024, 2048], out_channels=256,
              start_level=0, num_outs=5),
    roi_head=dict(type="PISARoIHead"))
train_cfg = dict(rcnn=dict(isr=dict(k=2.0, bias=0.0),
                           carl=dict(k=1.0, bias=0.2)))
