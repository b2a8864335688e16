# SCNet. Parity: reference configs/scnet/scnet_r50_fpn_1x_coco.py
_base_ = ["./htc_r50_fpn_1x_coco.py"]
model = dict(
    type="SCNet",
    roi_head=dict(
        type="SCNetRoIHead", mask_info_flow=False,
        glbctx_head=dict(type="GlobalContextHead", num_convs=4,
                         in_channels=256, conv_out_channels=256,
                         loss_weight=3.0),
        feat_relay_head=dict(type="FeatureRelayHead",
                             out_conv_channels=256)))
