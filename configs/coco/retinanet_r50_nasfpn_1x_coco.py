# NAS-FPN RetinaNet. Parity: reference
# configs/nas_fpn/retinanet_r50_nasfpn_crop640_50e_coco.py
_base_ = ["./retinanet_r50_fpn_1x_coco.py"]
model = dict(neck=dict(_delete_=True, type="NASFPN",
                       in_channels=[512, 1024, 2048], out_channels=256,
                       stack_times=7, num_outs=5))
