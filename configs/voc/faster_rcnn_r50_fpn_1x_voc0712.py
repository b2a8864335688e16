# PASCAL VOC Faster R-CNN. Parity: reference
# configs/pascal_voc/faster_rcnn_r50_fpn_1x_voc0712.py
_base_ = ["../coco/faster_rcnn_r50_fpn_1x_coco.py",
          "../_base_/datasets/voc0712.py"]
model = dict(roi_head=dict(bbox_head=dict(num_classes=20)))
