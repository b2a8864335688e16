# Grid R-CNN. Parity: reference
# configs/grid_rcnn/grid_rcnn_r50_fpn_gn-head_2x_coco.py
_base_ = ["./faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    type="GridRCNN",
    roi_head=dict(
        type="GridRoIHead",
        grid_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=14,
                           sampling_ratio=0),
            out_channels=256, featmap_strides=[4, 8, 16, 32]),
        grid_head=dict(type="GridHead", grid_points=9, num_convs=8,
                       in_channels=256, feat_channels=576,
                       point_feat_channels=64)))
