# CentripetalNet. Parity: reference
# configs/centripetalnet/centripetalnet_hourglass104_mstest_16x6_210e_coco.py
_base_ = ["./cornernet_hourglass104_10x5_coco.py"]
model = dict(
    type="CentripetalNet",
    bbox_head=dict(_delete_=True, type="CentripetalHead", num_classes=80,
                   in_channels=256, feat_channels=256, stride=4))
