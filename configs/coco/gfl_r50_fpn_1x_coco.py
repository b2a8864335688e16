# GFL R50-FPN 1x. Parity: reference configs/gfl/gfl_r50_fpn_1x_coco.py
_base_ = ["./atss_r50_fpn_1x_coco.py"]
model = dict(
    type="GFL",
    bbox_head=dict(_delete_=True, type="GFLHead", num_classes=80,
                   in_channels=256, feat_channels=256, stacked_convs=4,
                   reg_max=16,
                   anchor_generator=dict(type="AnchorGenerator", ratios=[1.0],
                                         octave_base_scale=8,
                                         scales_per_octave=1,
                                         strides=[8, 16, 32, 64, 128])))
