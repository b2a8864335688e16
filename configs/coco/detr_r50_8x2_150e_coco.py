# DETR R50 150e. Parity: reference configs/detr/detr_r50_8x2_150e_coco.py
_base_ = ["../_base_/datasets/coco_detection.py",
          "../_base_/schedules/schedule_1x.py",
          "../_base_/default_runtime.py"]
model = dict(
    type="DETR",
    backbone=dict(type="ResNet", depth=50, num_stages=4,
                  out_indices=(3,), frozen_stages=1),
    bbox_head=dict(type="DETRHead", num_classes=80, in_channels=2048,
                   num_query=100, embed_dims=256, num_encoder_layers=6,
                   num_decoder_layers=6))
test_cfg = dict(max_per_img=100, score_thr=0.0)
optimizer = dict(type="AdamW", lr=1e-4, weight_decay=1e-4)
