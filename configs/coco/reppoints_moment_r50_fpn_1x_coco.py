# RepPoints R50-FPN 1x. Parity: reference
# configs/reppoints/reppoints_moment_r50_fpn_1x_coco.py
_base_ = ["./fcos_r50_caffe_fpn_gn_head_1x_coco.py"]
model = dict(
    type="RepPointsDetector",
    bbox_head=dict(_delete_=True, type="RepPointsHead", num_classes=80,
                   in_channels=256, feat_channels=256, num_points=9,
                   transform_method="moment",
                   point_strides=[8, 16, 32, 64, 128]))
