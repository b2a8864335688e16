# DetectoRS (SAC + RFP) over Cascade R-CNN. Parity: reference
# configs/detectors/detectors_htc_r50_1x_coco.py (box pathway;
# the recursive pyramid + switchable atrous conv are the novelty).
_base_ = ["./cascade_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    type="DetectoRS",
    backbone=dict(_delete_=True, type="DetectoRS_ResNet", depth=50,
                  num_stages=4, out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_eval=True, output_img=True, sac=dict(type="SAC"),
                  stage_with_sac=(False, True, True, True)),
    neck=dict(_delete_=True, type="RFP",
              in_channels=[256, 512, 1024, 2048], out_channels=256,
              num_outs=5, rfp_steps=2, aspp_out_channels=64,
              rfp_backbone=dict(depth=50, num_stages=4,
                                out_indices=(0, 1, 2, 3),
                                sac=dict(type="SAC"),
                                stage_with_sac=(False, True, True, True))))
