"""Corruption-robustness benchmark tool (test_robustness.py) e2e."""
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("rob")
    data = root / "data"
    data.mkdir()
    rng = np.random.RandomState(0)
    images, annotations, ann_id = [], [], 1
    for i in range(2):
        fn = f"img{i}.jpg"
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            data / fn)
        images.append(dict(id=i + 1, file_name=fn, width=64, height=64))
        for _ in range(2):
            x, y = rng.randint(0, 40), rng.randint(0, 40)
            w, h = rng.randint(8, 16), rng.randint(8, 16)
            annotations.append(dict(
                id=ann_id, image_id=i + 1, category_id=1,
                bbox=[float(x), float(y), float(w), float(h)],
                area=float(w * h), iscrowd=0))
            ann_id += 1
    with open(data / "ann.json", "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name="person")]), f)

    cfg_text = f"""
img_norm = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="NoAug", transforms=[
        dict(type="Resize", keep_ratio=True),
        dict(type="Normalize", **img_norm),
        dict(type="Pad", size_divisor=32),
        dict(type="Collect", keys=["img"]),
    ]),
]
data = dict(
    samples_per_gpu=1,
    test=dict(type="CocoFmtDataset", ann_file=r"{data / 'ann.json'}",
              img_prefix=r"{data}", pipeline=test_pipeline),
)
loader = dict(pad_shape=(64, 64), max_gt=10)
model = dict(
    type="BasicLocator",
    backbone=dict(type="ResNet", depth=18, base_channels=8),
    neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
              start_level=0, add_extra_convs="on_input", num_outs=1),
    bbox_head=dict(type="P2PHead", num_classes=1, in_channels=16,
                   feat_channels=16, stacked_convs=1, strides=[4],
                   point_anchor=[(0.0, 0.0)],
                   norm_cfg=dict(type="GN", num_groups=4),
                   loss_cls=dict(type="FocalLoss", use_sigmoid=True),
                   loss_reg=dict(type="SmoothL1Loss", beta=0.111),
                   pts_gamma=1, reg_norm=1))
train_cfg = dict(
    neg_weight=1.0,
    assigner=dict(type="HungarianAssignerV2",
                  cls_costs=dict(type="FocalLossCost", weight=2.0),
                  reg_costs=dict(type="DisCostV2", weight=0.1,
                                 norm_with_img_wh=False), topk_k=2),
    sampler=dict(type="PseudoSampler"))
test_cfg = dict(nms_pre=100, score_thr=0.01, pseudo_wh=(16, 16),
                nms=dict(type="nms", iou_threshold=0.3), max_per_img=20)
evaluation = dict(metric="bbox")
"""
    cfg_file = root / "rob_cfg.py"
    cfg_file.write_text(cfg_text)
    return dict(root=str(root), cfg=str(cfg_file))


def test_robustness_tool(workspace, monkeypatch, capsys):
    import importlib

    import jax
    import jax.numpy as jnp

    from pointtinybenchmark_tpu.engine.checkpoint import save_checkpoint
    from pointtinybenchmark_tpu.models import build_detector
    from pointtinybenchmark_tpu.utils import Config

    cfg = Config.fromfile(workspace["cfg"])
    model = build_detector(dict(cfg.model), dict(cfg.train_cfg),
                           dict(cfg.test_cfg))
    img = jnp.ones((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    ckpt = os.path.join(workspace["root"], "init.ckpt")
    save_checkpoint(ckpt, dict(variables))

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "analysis_tools"))
    rob = importlib.import_module("test_robustness")
    out_json = os.path.join(workspace["root"], "rob.json")
    monkeypatch.setattr(sys, "argv", [
        "test_robustness.py", workspace["cfg"], ckpt,
        "--corruptions", "gaussian_noise", "pixelate",
        "--severities", "0", "3", "--out", out_json])
    rob.main()
    captured = capsys.readouterr().out
    assert "OVERALL mPC" in captured
    with open(out_json) as f:
        table = json.load(f)
    assert set(table) == {"gaussian_noise", "pixelate"}
    for sev_map in table.values():
        assert set(sev_map) == {"0", "3"}
        assert all(np.isfinite(v) for v in sev_map.values())
