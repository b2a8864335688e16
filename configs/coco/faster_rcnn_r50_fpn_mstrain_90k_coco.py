# Iter-based Faster R-CNN (IterBasedRunner). Parity: reference
# configs/faster_rcnn/faster_rcnn_r50_caffe_fpn_mstrain_90k_coco.py —
# max_iters schedule with lr step boundaries / checkpoint interval in
# ITERATIONS; multi-scale train via img_scale list.
_base_ = ["./faster_rcnn_r50_fpn_1x_coco.py"]

lr_config = dict(
    policy="step",
    warmup="linear",
    warmup_iters=500,
    warmup_ratio=0.001,
    step=[60000, 80000])

runner = dict(_delete_=True, type="IterBasedRunner", max_iters=90000)

checkpoint_config = dict(interval=10000)
evaluation = dict(interval=10000, metric="bbox")
