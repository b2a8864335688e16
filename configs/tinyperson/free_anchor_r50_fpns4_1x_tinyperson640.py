# Adap FreeAnchor TinyPerson (reference TinyPerson.md table row).
# Parity: configs2/TinyPerson/base pattern applied to
# configs/free_anchor/retinanet_free_anchor_r50_fpn_1x_coco.py.
_base_ = ["./retinanet_r50_fpns4_1x_tinyperson640.py"]
model = dict(
    bbox_head=dict(_delete_=True, type="FreeAnchorRetinaHead",
                   num_classes=1, in_channels=256, feat_channels=256,
                   stacked_convs=4,
                   anchor_generator=dict(type="AnchorGenerator",
                                         octave_base_scale=2,
                                         scales_per_octave=3,
                                         ratios=[0.5, 1.0, 2.0],
                                         strides=[4, 8, 16, 32, 64]),
                   bbox_coder=dict(target_means=[0, 0, 0, 0],
                                   target_stds=[1.0, 1.0, 1.0, 1.0])))
