# SparseRCNN. Parity: reference configs/sparse_rcnn.
_base_ = ["../_base_/datasets/coco_detection.py",
          "../_base_/schedules/schedule_1x.py",
          "../_base_/default_runtime.py"]
model = dict(
    type="SparseRCNN",
    backbone=dict(type="ResNet", depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=0, num_outs=4),
    num_proposals=100, num_stages=6, embed_dims=256, ffn_dim=2048,
    num_classes=80, featmap_strides=[4, 8, 16, 32],
)
train_cfg = dict()
test_cfg = dict(max_per_img=100, score_thr=0.0)
optimizer = dict(type="AdamW", lr=2.5e-5, weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=1, norm_type=2))
