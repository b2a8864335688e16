# P2P point localization on TinyPerson (stage-2 of the CPR -> P2P workflow:
# train on CPR-refined annotations produced by tools/result2ann.py).
# Parity: configs2/TinyPersonV2/p2p family.
_base_ = ["../_base_/datasets/tinyperson_640x512.py",
          "../_base_/default_runtime.py"]

norm_cfg = dict(type="GN", num_groups=32)

model = dict(
    type="BasicLocator",
    backbone=dict(type="ResNet", depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=0, add_extra_convs="on_input",
              num_outs=1, norm_cfg=norm_cfg),
    bbox_head=dict(
        type="P2PHead", num_classes=1, in_channels=256, feat_channels=256,
        stacked_convs=4, strides=[4], point_anchor=[(0.0, 0.0)],
        norm_cfg=norm_cfg,
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_reg=dict(type="SmoothL1Loss", beta=1.0 / 9.0, loss_weight=0.5),
        pts_gamma=1, reg_norm=1),
)
train_cfg = dict(
    neg_weight=1.0,
    assigner=dict(type="HungarianAssignerV2",
                  cls_costs=dict(type="FocalLossCost", weight=2.0),
                  reg_costs=dict(type="DisCostV2", weight=0.1,
                                 norm_with_img_wh=False),
                  topk_k=5),
    sampler=dict(type="PseudoSampler"))
test_cfg = dict(nms_pre=1000, min_bbox_size=0, score_thr=0.05,
                pseudo_wh=(16, 16), nms=dict(type="nms", iou_threshold=0.01),
                max_per_img=1000)

evaluation = dict(
    interval=3, metric="bbox", tiled=True,
    use_location_metric=True,
    location_kwargs=dict(
        matcher_kwargs=dict(multi_match_not_false_alarm=False),
        location_param=dict(matchThs=[0.5, 1.0, 2.0], maxDets=[300])),
)

optimizer = dict(type="Adam", lr=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy="step", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, step=[8, 11])
runner = dict(type="EpochBasedRunner", max_epochs=12)
