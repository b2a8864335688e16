# Grid R-CNN TinyPerson (reference TinyPerson.md table row).
# Parity: the Adap two-stage recipe (RPN scales [2], FPN s4) over
# configs/grid_rcnn.
_base_ = ["./faster_rcnn_r50_fpn_1x_tinyperson640.py"]
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
