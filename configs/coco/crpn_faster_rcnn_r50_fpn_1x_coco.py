# Cascade RPN + Faster R-CNN. Parity: reference
# configs/cascade_rpn/crpn_faster_rcnn_r50_caffe_fpn_1x_coco.py
_base_ = ["./faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    rpn_head=dict(_delete_=True, type="CascadeRPNHead", in_channels=256,
                  feat_channels=256, strides=[4, 8, 16, 32, 64],
                  anchor_scale=4.0, bridged_feature=True))
train_cfg = dict(
    rpn=[dict(assigner=dict(center_ratio=0.2, ignore_ratio=0.5),
              target_stds=(0.1, 0.1, 0.5, 0.5), loss_weight=10.0),
         dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3),
              target_stds=(0.05, 0.05, 0.1, 0.1), loss_weight=10.0)])
