# SABL Faster R-CNN. Parity: reference
# configs/sabl/sabl_faster_rcnn_r50_fpn_1x_coco.py
_base_ = ["./faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    roi_head=dict(
        type="SABLRoIHead",
        bbox_head=dict(_delete_=True, type="SABLHead", num_classes=80,
                       in_channels=256, num_buckets=14,
                       cls_out_channels=1024, reg_feat_out_channels=256,
                       reg_out_channels=1024, roi_feat_size=7,
                       scale_factor=1.7,
                       loss_cls=dict(type="CrossEntropyLoss"))))
