# Parity: TOV_mmdetection/configs2/_base_/datasets/visDrone/
# visDronePerson_detection_640x640_s1xtest.py — same as the 640x640 base but
# with the UNTILED scale-1x test pipeline (MultiScaleFlipAug) re-enabled.
_base_ = ["./visdroneperson_detection_640x640.py"]
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="MultiScaleFlipAug",
         scale_factor=[1.0],
         flip=False,
         transforms=[
             dict(type="Resize", keep_ratio=True),
             dict(type="RandomFlip"),
             dict(type="Normalize", **img_norm_cfg),
             dict(type="Pad", size_divisor=32),
             dict(type="ImageToTensor", keys=["img"]),
             dict(type="Collect", keys=["img"]),
         ]),
]
data = dict(
    val=dict(pipeline=test_pipeline),
    test=dict(pipeline=test_pipeline),
)
loader = dict(pad_shape=None)
