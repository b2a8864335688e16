# Cascade R-CNN R50-FPN 1x. Parity: reference
# configs/cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py
_base_ = ["./faster_rcnn_r50_fpn_1x_coco.py"]
_bbox = dict(type="Shared2FCBBoxHead", num_classes=80, in_channels=256,
             fc_out_channels=1024, roi_feat_size=7,
             loss_cls=dict(type="CrossEntropyLoss"),
             loss_bbox=dict(type="SmoothL1Loss", beta=1.0))
model = dict(
    type="CascadeRCNN",
    roi_head=dict(
        _delete_=True, type="CascadeRoIHead", num_stages=3,
        stage_loss_weights=[1.0, 0.5, 0.25],
        bbox_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=7, sampling_ratio=0),
            out_channels=256, featmap_strides=[4, 8, 16, 32]),
        bbox_head=[
            dict(_bbox, bbox_coder=dict(target_stds=[0.1, 0.1, 0.2, 0.2])),
            dict(_bbox, bbox_coder=dict(target_stds=[0.05, 0.05, 0.1, 0.1])),
            dict(_bbox, bbox_coder=dict(
                target_stds=[0.033, 0.033, 0.067, 0.067]))]))
train_cfg = dict(
    rcnn=[dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=t,
                             neg_iou_thr=t, min_pos_iou=t),
               sampler=dict(type="RandomSampler", num=512,
                            pos_fraction=0.25, add_gt_as_proposals=True))
          for t in (0.5, 0.6, 0.7)])
