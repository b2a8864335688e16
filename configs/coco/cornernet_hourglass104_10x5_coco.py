# CornerNet. Parity: reference configs/cornernet.
_base_ = ["../_base_/datasets/coco_detection.py",
          "../_base_/default_runtime.py"]
model = dict(
    type="CornerNet",
    backbone=dict(type="HourglassNet", downsample_times=5, num_stacks=2,
                  stage_channels=[256, 256, 384, 384, 384, 512],
                  stage_blocks=[2, 2, 2, 2, 2, 4], feat_channel=256),
    bbox_head=dict(type="CornerHead", num_classes=80, in_channels=256,
                   feat_channels=256, stride=4),
)
train_cfg = dict()
test_cfg = dict(corner_topk=100, max_per_img=100, score_thr=0.05,
                distance_threshold=0.5)
optimizer = dict(type="Adam", lr=5e-4)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy="step", step=[180])
runner = dict(type="EpochBasedRunner", max_epochs=210)
