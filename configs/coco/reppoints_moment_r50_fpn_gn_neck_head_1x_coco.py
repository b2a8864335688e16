# RepPoints R50-FPN with GN neck+head on COCO — the pretrain base the fork
# fine-tunes from for the TinyPerson RepPoints rows.
# Parity: TOV_mmdetection/configs2/COCO/base/
# reppoints_moment_r50_fpn_gn-neck+head_1x_coco.py
_base_ = ["./reppoints_moment_r50_fpn_1x_coco.py"]

norm_cfg = dict(type="GN", num_groups=32)
model = dict(
    neck=dict(norm_cfg=norm_cfg),
    bbox_head=dict(norm_cfg=norm_cfg))
