"""End-to-end CLI test: train on a LEARNABLE synthetic square dataset,
then test with tiled inference + tiny-COCO eval and assert an AP floor
(VERDICT r1 item 4: metric regressions must fail CI, not just
artifact-existence checks). Runs in-process on the CPU mesh."""
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws")
    data = root / "data"
    data.mkdir()
    rng = np.random.RandomState(0)
    images, annotations, ann_id = [], [], 1
    for i in range(8):
        fn = f"img{i}.jpg"
        # learnable: bright squares on dark noise (test_learnability's
        # square generator, adapted)
        img = (rng.rand(64, 96, 3) * 25).astype(np.uint8)
        images.append(dict(id=i + 1, file_name=fn, width=96, height=64))
        for _ in range(2):
            x, y = int(rng.randint(2, 78)), int(rng.randint(2, 46))
            w = h = int(rng.randint(10, 15))
            img[y:y + h, x:x + w] = 255
            annotations.append(dict(
                id=ann_id, image_id=i + 1, category_id=1,
                bbox=[float(x), float(y), float(w), float(h)],
                area=float(w * h), iscrowd=0))
            ann_id += 1
        Image.fromarray(img).save(data / fn)
    with open(data / "ann.json", "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name="person")]), f)

    cfg_text = f"""
img_norm = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", scale_factor=[1.0], keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm),
    dict(type="Pad", size_divisor=32),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels", "gt_bboxes_ignore"]),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="CroppedTilesFlipAug", tile_shape=(64, 64), tile_overlap=(16, 16),
         scale_factor=[1.0], flip=False,
         transforms=[
             dict(type="Resize", keep_ratio=True),
             dict(type="RandomFlip"),
             dict(type="Normalize", **img_norm),
             dict(type="Pad", size_divisor=32),
             dict(type="Collect", keys=["img"]),
         ]),
]
data = dict(
    samples_per_gpu=1,
    train=dict(type="CocoFmtDataset", ann_file=r"{data / 'ann.json'}",
               img_prefix=r"{data}", pipeline=train_pipeline),
    val=dict(type="CocoFmtDataset", ann_file=r"{data / 'ann.json'}",
             img_prefix=r"{data}", pipeline=test_pipeline),
    test=dict(type="CocoFmtDataset", ann_file=r"{data / 'ann.json'}",
              img_prefix=r"{data}", pipeline=test_pipeline),
)
loader = dict(pad_shape=(64, 96), max_gt=10)
model = dict(
    type="BasicLocator",
    backbone=dict(type="ResNet", depth=18, base_channels=8),
    neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
              start_level=0, add_extra_convs="on_input", num_outs=1),
    bbox_head=dict(type="P2PHead", num_classes=1, in_channels=16,
                   feat_channels=16, stacked_convs=1, strides=[4],
                   point_anchor=[(0.0, 0.0)],
                   norm_cfg=dict(type="GN", num_groups=4),
                   loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                 gamma=2.0, alpha=0.25, loss_weight=1.0),
                   loss_reg=dict(type="SmoothL1Loss", beta=0.111,
                                 loss_weight=0.5),
                   pts_gamma=1, reg_norm=1))
train_cfg = dict(
    neg_weight=1.0,
    assigner=dict(type="HungarianAssignerV2",
                  cls_costs=dict(type="FocalLossCost", weight=2.0),
                  reg_costs=dict(type="DisCostV2", weight=0.1,
                                 norm_with_img_wh=False), topk_k=2),
    sampler=dict(type="PseudoSampler"))
test_cfg = dict(nms_pre=100, score_thr=0.01, pseudo_wh=(12, 12),
                nms=dict(type="nms", iou_threshold=0.3), max_per_img=30)
evaluation = dict(interval=1, metric="bbox", tiled=True,
                  proposal_nums=[1000],
                  cocofmt_kwargs=dict(
                      use_ignore_attr=True, use_iod_for_ignore=True,
                      cocofmt_param=dict(evaluate_standard="tiny")))
optimizer = dict(type="Adam", lr=2e-3)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy="step", warmup=None, step=[100])
runner = dict(type="EpochBasedRunner", max_epochs=12)
checkpoint_config = dict(interval=12)
log_config = dict(interval=4)
check = dict(stop_while_nan=True)
"""
    cfg_file = root / "tiny_cfg.py"
    cfg_file.write_text(cfg_text)
    return dict(root=str(root), cfg=str(cfg_file))


def test_train_then_test_cli(workspace, monkeypatch, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import importlib
    train_mod = importlib.import_module("train")
    work_dir = os.path.join(workspace["root"], "work")
    monkeypatch.setattr(sys, "argv", [
        "train.py", workspace["cfg"], "--work-dir", work_dir,
        "--no-validate"])
    train_mod.main()
    ckpt = os.path.join(work_dir, "epoch_12.ckpt")
    assert os.path.exists(ckpt)

    test_mod = importlib.import_module("test")
    out_json = os.path.join(work_dir, "results.json")
    monkeypatch.setattr(sys, "argv", [
        "test.py", workspace["cfg"], ckpt, "--out", out_json])
    capsys.readouterr()  # drop training noise
    test_mod.main()
    assert os.path.exists(out_json)
    with open(out_json) as f:
        dets = json.load(f)
    assert isinstance(dets, list)
    # metric floor: tools/test.py prints the metrics dict as its last json
    out = capsys.readouterr().out
    metrics = json.loads(out[out.rindex("{"):out.rindex("}") + 1])
    assert metrics["AP50_tiny"] >= 0.3, metrics
