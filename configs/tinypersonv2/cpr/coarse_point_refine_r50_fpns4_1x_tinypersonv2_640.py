# CPR on TinyPersonV2 (SeaPerson) coarse points, 640x640 corner tiles.
# Parity: TOV_mmdetection/configs2/TinyPersonV2/coarsepointv2/
# coarse_point_refine_base_TinyPersonV2_640.py +
# coarse_point_refine_r50_fpns4_1x_TinyPersonV2_640.py
_base_ = ["../../cpr/coarse_point_refine_r50_fpns4_1x_coco.py"]

dataset_type = "CocoFmtDataset"
data_root = "data/tiny_set_v2/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", scale_factor=[1.0], keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="DefaultFormatBundle"),
    dict(type="Collect",
         keys=["img", "gt_bboxes", "gt_labels", "gt_bboxes_ignore",
               "gt_true_bboxes", "gt_anns_id"]),
]
# CPR "inference" refines the train annotations: val = train ann + gt-through
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", scale_factor=[1.0], keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.0),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Collect",
         keys=["img", "gt_bboxes", "gt_labels", "gt_true_bboxes",
               "gt_anns_id"]),
]
coarse_ann = (data_root + "anns/release/corner/coarse/noise_rg-0-0.25_1/"
              "corner_w640_h640/pseuw16h16/"
              "rgb_train_w640h640ow100oh100_coarse.json")
data = dict(
    samples_per_gpu=2,
    train=dict(
        _delete_=True,
        type=dataset_type,
        min_gt_size=2,
        ann_file=coarse_ann,
        img_prefix=data_root + "imgs/",
        pipeline=train_pipeline),
    val=dict(
        _delete_=True,
        type=dataset_type,
        min_gt_size=2,
        ann_file=coarse_ann,
        img_prefix=data_root + "imgs/",
        pipeline=test_pipeline,
        test_mode=False),
    test=dict(
        _delete_=True,
        type=dataset_type,
        ann_file=data_root + "anns/release/rgb_test.json",
        img_prefix=data_root + "imgs/",
        pipeline=test_pipeline),
)
loader = dict(pad_shape=(640, 640), max_gt=200)

alpha = 0.25
model = dict(
    bbox_head=dict(
        num_classes=1,
        loss_mil=dict(type="MILLoss", binary_ins=False, loss_weight=alpha),
        loss_cfg=dict(with_neg=True, neg_loss_weight=1 - alpha,
                      refine_bag_policy="independent_with_gt_bag",
                      random_remove_rate=0.4,
                      with_gt_loss=True, gt_loss_weight=alpha,
                      with_mil_loss=True)),
)
evaluation = dict(
    _delete_=True,
    interval=13, metric="bbox",
    skip_eval=True, do_first_eval=False, do_final_eval=True,
    use_location_metric=True,
    location_kwargs=dict(
        class_wise=False,
        matcher_kwargs=dict(multi_match_not_false_alarm=False),
        location_param=dict(matchThs=[0.5, 1.0, 2.0], maxDets=[1000])),
    save_result_file="exp/latest_result.json",
)
optimizer = dict(lr=0.01)
optimizer_config = dict(_delete_=True,
                        grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy="step", warmup="linear", warmup_iters=500,
                 warmup_ratio=0.001, step=[8, 11])
runner = dict(type="EpochBasedRunner", max_epochs=12)
find_unused_parameters = True
