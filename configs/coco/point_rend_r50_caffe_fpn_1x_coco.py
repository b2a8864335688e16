# PointRend. Parity: reference
# configs/point_rend/point_rend_r50_caffe_fpn_mstrain_1x_coco.py
_base_ = ["./mask_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    type="PointRend",
    roi_head=dict(
        type="PointRendRoIHead",
        point_head=dict(type="MaskPointHead", num_fcs=3, in_channels=256,
                        fc_channels=256, coarse_pred_each_layer=True)))
train_cfg = dict(rcnn=dict(num_points=196, oversample_ratio=3,
                           importance_sample_ratio=0.75))
test_cfg = dict(rcnn=dict(subdivision_steps=2, subdivision_num_points=784,
                          scale_factor=2))
