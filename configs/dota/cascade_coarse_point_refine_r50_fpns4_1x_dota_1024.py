# Cascaded CPR (CPR++ direction) on DOTA coarse points, 1024 tiles.
# Parity: TOV_mmdetection/configs2/DOTA/coarsepointv2/
# cascade_coarse_point_refine_r50_fpns4_1x_DOTA_1024.py (the reference
# config references CascadeCPRHead, which is NOT implemented in the
# reference checkout — SURVEY.md §0; implemented here).
_base_ = ["./coarse_point_refine_r50_fpns4_1x_dota.py"]

num_stages = 2
model = dict(
    bbox_head=dict(
        type="CascadeCPRHead",
        cascade_cfg=dict(
            gt_src="gt_refine",
            weight_with_score=False,
            weight_type="max",
            conditional_refine=True,
            increase_r=False,
            increase_r_step=1,
        ),
        loss_cfg=dict(
            refine_bag_policy="only_refine_bag",
            with_gt_loss=True,
            gt_loss_type="gt",
        ),
        point_refiner=dict(merge_th=0.1, refine_th=0.1,
                           classify_filter=True),
        train_pts_extractor=dict(
            pos_generator=dict(type="CirclePtFeatGenerator", radius=3),
            neg_generator=dict(type="OutCirclePtFeatGenerator", radius=3,
                               class_wise=True)),
        refine_pts_extractor=dict(
            pos_generator=dict(type="CirclePtFeatGenerator", radius=3),
            neg_generator=dict(type="OutCirclePtFeatGenerator", radius=3,
                               keep_wh=True, class_wise=True)),
        cascade_stages=num_stages,
    ),
)
