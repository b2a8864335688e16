# DeepFashion Mask R-CNN. Parity: reference
# configs/deepfashion/mask_rcnn_r50_fpn_15e_deepfashion.py
_base_ = ["../coco/mask_rcnn_r50_fpn_1x_coco.py",
          "../_base_/datasets/deepfashion.py"]
model = dict(roi_head=dict(bbox_head=dict(num_classes=15),
                           mask_head=dict(num_classes=15)))
