# MMDet V1.x RetinaNet, caffe-style backbone. Parity: reference
# configs/legacy_1.x/retinanet_r50_caffe_fpn_1x_coco_v1.py
_base_ = ["./retinanet_r50_fpn_1x_coco_v1.py"]
model = dict(backbone=dict(norm_eval=True, style="caffe"))
img_norm_cfg = dict(mean=[102.9801, 115.9465, 122.7717],
                    std=[1.0, 1.0, 1.0], to_rgb=False)
