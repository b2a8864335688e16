# Libra Faster R-CNN TinyPerson (reference TinyPerson.md table row).
_base_ = ["./faster_rcnn_r50_fpn_1x_tinyperson640.py"]
model = dict(
    neck=[dict(type="FPN", in_channels=[256, 512, 1024, 2048],
               out_channels=256, start_level=0, num_outs=5),
          dict(type="BFP", in_channels=256, num_levels=5, refine_level=2,
               refine_type="conv")],
    roi_head=dict(bbox_head=dict(
        loss_bbox=dict(_delete_=True, type="BalancedL1Loss", alpha=0.5,
                       gamma=1.5, beta=1.0))))
