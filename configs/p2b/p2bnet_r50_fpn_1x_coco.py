# P2BNet (point-to-box via cascaded MIL, ECCV2022) on COCO point
# annotations. PAPER-SPEC (arXiv 2207.06827): the reference repo hosts
# P2BNet on a separate branch that is not in this checkout, so constants
# below are the paper's defaults, not a pinned config surface.
# Workflow: train this model on point annotations -> refine_test emits
# pseudo boxes -> tools/result2ann.py writes a pseudo-box annotation file
# -> train configs/coco/faster_rcnn_r50_fpn_1x_coco.py on it (the P2BNet
# second stage is a stock Faster R-CNN).
_base_ = ["../_base_/default_runtime.py"]

dataset_type = "CocoFmtDataset"
data_root = "data/coco/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="DefaultFormatBundle"),
    dict(type="Collect",
         keys=["img", "gt_bboxes", "gt_labels", "gt_bboxes_ignore",
               "gt_true_bboxes", "gt_anns_id"]),
]
# "inference" is annotation refinement: points in, pseudo boxes out
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.0),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="Collect",
         keys=["img", "gt_bboxes", "gt_labels", "gt_true_bboxes",
               "gt_anns_id"]),
]
data = dict(
    samples_per_gpu=2,
    train=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/instances_train2017.json",
        img_prefix=data_root + "images/",
        # point supervision: centers jittered inside the object
        noise_kwargs=dict(pseudo_wh=(16, 16), noise_rg=0.25),
        pipeline=train_pipeline),
    val=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/instances_val2017.json",
        img_prefix=data_root + "images/",
        noise_kwargs=dict(pseudo_wh=(16, 16), noise_rg=0.25),
        pipeline=test_pipeline),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/instances_val2017.json",
        img_prefix=data_root + "images/",
        noise_kwargs=dict(pseudo_wh=(16, 16), noise_rg=0.25),
        pipeline=test_pipeline),
)
loader = dict(pad_shape=(800, 1344), max_gt=100)

model = dict(
    type="P2BNet",
    backbone=dict(type="ResNet", depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=0, num_outs=4),
    bbox_head=dict(
        type="P2BNetHead",
        num_classes=80, in_channels=256, fc_channels=1024, roi_size=7,
        featmap_strides=[4, 8, 16, 32],
        # CBP bag: anchor-like proposals centered on the point
        cbp_scales=[8, 16, 32, 64, 128],
        cbp_ratios=[1.0 / 3, 0.5, 1.0, 2.0, 3.0],
        # PBR bag: scale x offset jitter grid around the coarse box
        pbr_scale_jitter=[0.8, 1.0, 1.2],
        pbr_offset_frac=[-0.2, 0.0, 0.2],
        pbr_stages=1,
        merge_topk=4,
        neg_iou_thr=0.3,
        loss_mil=dict(type="MILLoss", binary_ins=False, loss_weight=0.25),
        neg_loss_weight=0.75),
)
test_cfg = dict()

evaluation = dict(interval=1, metric="bbox",
                  save_result_file="exp/latest_result.json")

optimizer = dict(type="SGD", lr=0.02, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy="step", warmup="linear", warmup_iters=500,
                 warmup_ratio=0.001, step=[8, 11])
runner = dict(type="EpochBasedRunner", max_epochs=12)
