# Deformable DETR. Parity: reference configs/deformable_detr.
_base_ = ["../_base_/datasets/coco_detection.py",
          "../_base_/default_runtime.py"]
model = dict(
    type="DeformableDETR",
    backbone=dict(type="ResNet", depth=50, num_stages=4,
                  out_indices=(1, 2, 3), frozen_stages=1, norm_eval=True),
    neck=dict(type="ChannelMapper", in_channels=[512, 1024, 2048],
              out_channels=256, kernel_size=1, num_outs=4),
    bbox_head=dict(type="DeformableDETRHead", num_classes=80,
                   in_channels=256, num_query=300, embed_dims=256,
                   num_heads=8, num_encoder_layers=6, num_decoder_layers=6,
                   ffn_dim=1024, num_levels=4, num_points=4),
)
train_cfg = dict()
test_cfg = dict(max_per_img=100, score_thr=0.0)
optimizer = dict(type="AdamW", lr=2e-4, weight_decay=1e-4,
                 paramwise_cfg=dict(
                     custom_keys={"backbone": dict(lr_mult=0.1)}))
optimizer_config = dict(grad_clip=dict(max_norm=0.1, norm_type=2))
lr_config = dict(policy="step", step=[40])
runner = dict(type="EpochBasedRunner", max_epochs=50)
