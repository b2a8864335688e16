# DCN Faster R-CNN. Parity: reference
# configs/dcn/faster_rcnn_r50_fpn_dconv_c3-c5_1x_coco.py
_base_ = ["./faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(dcn=dict(type="DCNv2"),
                           stage_with_dcn=(False, True, True, True)))
