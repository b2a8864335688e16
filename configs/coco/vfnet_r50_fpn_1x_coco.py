# VFNet R50-FPN 1x. Parity: reference configs/vfnet/vfnet_r50_fpn_1x_coco.py
_base_ = ["./fcos_r50_caffe_fpn_gn_head_1x_coco.py"]
model = dict(
    type="VFNet",
    bbox_head=dict(_delete_=True, type="VFNetHead", num_classes=80,
                   in_channels=256, feat_channels=256,
                   strides=[8, 16, 32, 64, 128]))
