# FSAF R50-FPN 1x. Parity: reference configs/fsaf/fsaf_r50_fpn_1x_coco.py
_base_ = ["./retinanet_r50_fpn_1x_coco.py"]
model = dict(
    type="FSAF",
    bbox_head=dict(_delete_=True, type="FSAFHead", num_classes=80,
                   in_channels=256, feat_channels=256,
                   strides=[8, 16, 32, 64, 128]))
train_cfg = dict(_delete_=True)
