# WIDER Face SSD. Parity: reference configs/wider_face/ssd300_wider_face.py
_base_ = ["../coco/ssd300_coco.py", "../_base_/datasets/wider_face.py"]
model = dict(bbox_head=dict(num_classes=1))
