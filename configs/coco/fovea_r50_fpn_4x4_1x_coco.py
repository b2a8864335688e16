# FoveaBox R50-FPN 1x. Parity: reference
# configs/foveabox/fovea_r50_fpn_4x4_1x_coco.py
_base_ = ["./fcos_r50_caffe_fpn_gn_head_1x_coco.py"]
model = dict(
    type="FoveaBox",
    bbox_head=dict(_delete_=True, type="FoveaHead", num_classes=80,
                   in_channels=256, feat_channels=256,
                   strides=[8, 16, 32, 64, 128],
                   base_edge_list=[16, 32, 64, 128, 256],
                   scale_ranges=((1, 64), (32, 128), (64, 256), (128, 512),
                                 (256, 2048))))
