# Mixed-precision RetinaNet. Parity: reference
# configs/fp16/retinanet_r50_fpn_fp16_1x_coco.py — the TPU-native analog is
# bfloat16 compute (MXU native; no loss scaling needed, unlike fp16).
_base_ = ["./retinanet_r50_fpn_1x_coco.py"]
model = dict(backbone=dict(dtype="bfloat16"),
             neck=dict(dtype="bfloat16"),
             bbox_head=dict(dtype="bfloat16"))
