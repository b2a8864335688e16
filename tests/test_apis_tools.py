import json
import os
import os.path as osp
import sys

import numpy as np
import pytest
from PIL import Image

TOOLS = osp.join(osp.dirname(__file__), "..", "tools")


@pytest.fixture(scope="module")
def tiny_workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("apiws")
    data = root / "data"
    data.mkdir()
    rng = np.random.RandomState(0)
    images, annotations, ann_id = [], [], 1
    for i in range(3):
        fn = f"img{i}.jpg"
        Image.fromarray((rng.rand(64, 96, 3) * 255).astype(np.uint8)).save(
            data / fn)
        images.append(dict(id=i + 1, file_name=fn, width=96, height=64))
        for _ in range(2):
            x, y = rng.randint(0, 70), rng.randint(0, 40)
            annotations.append(dict(id=ann_id, image_id=i + 1, category_id=1,
                                    bbox=[float(x), float(y), 10.0, 10.0],
                                    area=100.0, iscrowd=0))
            ann_id += 1
    with open(data / "ann.json", "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name="person")]), f)
    cfg = root / "cfg.py"
    cfg.write_text(f"""
img_norm = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", scale_factor=[1.0], keep_ratio=True),
    dict(type="Normalize", **img_norm),
    dict(type="Pad", size_divisor=32),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels"]),
]
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
    train=dict(type="CocoFmtDataset", ann_file=r"{data / 'ann.json'}",
               img_prefix=r"{data}", pipeline=train_pipeline),
    test=dict(type="CocoFmtDataset", ann_file=r"{data / 'ann.json'}",
              img_prefix=r"{data}", pipeline=test_pipeline),
)
loader = dict(pad_shape=(64, 96), max_gt=10)
model = dict(
    type="SingleStageDetector",
    backbone=dict(type="ResNet", depth=18, base_channels=8),
    neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
              start_level=0, add_extra_convs="on_input", num_outs=5),
    bbox_head=dict(type="RetinaHead", num_classes=1, in_channels=16,
                   feat_channels=16, stacked_convs=1,
                   anchor_generator=dict(type="AnchorGenerator",
                                         octave_base_scale=2,
                                         scales_per_octave=3,
                                         ratios=[1.0],
                                         strides=[4, 8, 16, 32, 64]),
                   bbox_coder=dict(target_means=[0, 0, 0, 0],
                                   target_stds=[1, 1, 1, 1]),
                   loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                 gamma=2.0, alpha=0.25, loss_weight=1.0),
                   loss_bbox=dict(type="L1Loss", loss_weight=1.0)))
train_cfg = dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                               neg_iou_thr=0.4, min_pos_iou=0,
                               ignore_iof_thr=-1),
                 allowed_border=-1, pos_weight=-1)
test_cfg = dict(nms_pre=100, score_thr=0.01,
                nms=dict(type="nms", iou_threshold=0.5), max_per_img=20)
optimizer = dict(type="Adam", lr=1e-3)
""")
    return dict(root=str(root), cfg=str(cfg), img=str(data / "img0.jpg"))


def test_inference_api(tiny_workspace):
    from pointtinybenchmark_tpu.apis import inference_detector, init_detector
    handle = init_detector(tiny_workspace["cfg"])  # random weights
    result = inference_detector(handle, tiny_workspace["img"])
    assert "bboxes" in result and "labels" in result
    assert result["bboxes"].ndim == 2
    # list input
    results = inference_detector(handle, [tiny_workspace["img"]] * 2)
    assert len(results) == 2


def test_show_result(tiny_workspace, tmp_path):
    from pointtinybenchmark_tpu.visualization import imshow_det_bboxes
    img = np.zeros((50, 60, 3), np.uint8)
    out = imshow_det_bboxes(
        img, np.asarray([[5, 5, 20, 20, 0.9]]), np.asarray([0]),
        class_names=["person"], out_file=str(tmp_path / "v.png"))
    assert out.shape == (50, 60, 3)
    assert (tmp_path / "v.png").exists()
    assert out.sum() > 0  # something was drawn


def test_dataset_wrappers(tiny_workspace):
    from pointtinybenchmark_tpu.data import (ClassBalancedDataset,
                                             CocoFmtDataset, ConcatDataset,
                                             RepeatDataset)
    from pointtinybenchmark_tpu.utils import Config
    cfg = Config.fromfile(tiny_workspace["cfg"])
    base = CocoFmtDataset(**{k: v for k, v in dict(cfg.data["train"]).items()
                             if k != "type"})
    rep = RepeatDataset(base, times=3)
    assert len(rep) == 3 * len(base)
    assert rep[len(base)] is not None
    cat = ConcatDataset([base, base])
    assert len(cat) == 2 * len(base)
    assert cat[len(base) + 1] is not None
    cb = ClassBalancedDataset(base, oversample_thr=0.5)
    assert len(cb) >= len(base)


def test_profiling_helpers(capsys):
    from pointtinybenchmark_tpu.utils.profiling import profile_time
    import jax.numpy as jnp
    with profile_time("test", "op"):
        _ = jnp.ones((4,)).sum()
    out = capsys.readouterr().out
    assert "[profile] test.op" in out


def test_analyze_logs(tmp_path):
    sys.path.insert(0, osp.join(TOOLS, "analysis_tools"))
    import importlib
    mod = importlib.import_module("analyze_logs")
    log = tmp_path / "log.json"
    with open(log, "w") as f:
        for i in range(5):
            f.write(json.dumps(dict(epoch=1, iter=i, loss=1.0 / (i + 1),
                                    iter_time=0.1)) + "\n")
    entries = mod.load_log(str(log))
    assert len(entries) == 5
    old_argv = sys.argv
    try:
        sys.argv = ["analyze_logs.py", "cal_train_time", str(log)]
        mod.main()
        sys.argv = ["analyze_logs.py", "plot_curve", str(log),
                    "--keys", "loss", "--out", str(tmp_path / "c.png")]
        mod.main()
        assert (tmp_path / "c.png").exists()
    finally:
        sys.argv = old_argv


def test_run_tta_test(tiny_workspace):
    """TTA merge loop: flip views map back and merge without error."""
    import jax
    import jax.numpy as jnp
    from pointtinybenchmark_tpu.data import (CocoFmtDataset, DetCollator)
    from pointtinybenchmark_tpu.engine import run_tta_test
    from pointtinybenchmark_tpu.models import build_detector
    from pointtinybenchmark_tpu.utils import Config
    cfg = Config.fromfile(tiny_workspace["cfg"])
    pipeline = [
        dict(type="LoadImageFromFile"),
        dict(type="MultiScaleFlipAug", scale_factor=[1.0], flip=True,
             transforms=[
                 dict(type="Resize", keep_ratio=True),
                 dict(type="RandomFlip"),
                 dict(type="Normalize", mean=[123.675, 116.28, 103.53],
                      std=[58.395, 57.12, 57.375]),
                 dict(type="Pad", size_divisor=32),
                 dict(type="Collect", keys=["img"]),
             ]),
    ]
    ds_cfg = dict(cfg.data["test"])
    ds_cfg["pipeline"] = pipeline
    ds_cfg["test_mode"] = True
    ds_cfg.pop("type")
    dataset = CocoFmtDataset(**ds_cfg)
    model = build_detector(dict(cfg.model), cfg.get("train_cfg"),
                           cfg.get("test_cfg"))
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    state = dict(params=variables["params"],
                 batch_stats=variables.get("batch_stats", {}))
    collator = DetCollator(pad_shape=(64, 96), max_gt=10)
    results = run_tta_test(model, state, dataset, collator)
    assert len(results) == len(dataset)
    assert all("bboxes" in r for r in results)


def test_lvis_dataset_filename_mapping(tmp_path):
    import json
    from pointtinybenchmark_tpu.data import LVISDataset
    ds = dict(images=[dict(id=1, coco_url="http://images.cocodataset.org/"
                           "val2017/000000000139.jpg",
                           width=64, height=64)],
              annotations=[dict(id=1, image_id=1, category_id=1,
                                bbox=[1.0, 1.0, 10.0, 10.0], area=100.0,
                                iscrowd=0)],
              categories=[dict(id=1, name="a")])
    f = tmp_path / "lvis.json"
    with open(f, "w") as fh:
        json.dump(ds, fh)
    d = LVISDataset(ann_file=str(f), pipeline=[], test_mode=True)
    assert d.data_infos[0]["file_name"] == "val2017/000000000139.jpg"


def test_coco_error_analysis(tmp_path):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "cea", osp.join(TOOLS, "analysis_tools", "coco_error_analysis.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rng = np.random.RandomState(0)
    images, anns, dets, aid = [], [], [], 1
    for i in range(3):
        images.append(dict(id=i + 1, file_name=f"{i}.jpg",
                           width=100, height=100))
        for _ in range(3):
            x, y = [int(v) for v in rng.randint(0, 60, 2)]
            w, h = [int(v) for v in rng.randint(8, 30, 2)]
            cat = int(rng.choice([1, 2]))
            anns.append(dict(id=aid, image_id=i + 1, category_id=cat,
                             bbox=[float(x), float(y), float(w), float(h)],
                             area=float(w * h), iscrowd=0))
            dets.append(dict(image_id=i + 1, category_id=cat,
                             bbox=[float(x + 2), float(y + 1),
                                   float(w), float(h)],
                             score=float(rng.rand() * 0.5 + 0.5)))
            aid += 1
    gtf = dict(images=images, annotations=anns,
               categories=[dict(id=1, name="a", supercategory="s"),
                           dict(id=2, name="b", supercategory="s")])
    gt_p, dt_p = tmp_path / "gt.json", tmp_path / "dt.json"
    with open(gt_p, "w") as f:
        json.dump(gtf, f)
    with open(dt_p, "w") as f:
        json.dump(dets, f)
    ps = mod.analyze_results(str(dt_p), str(gt_p), str(tmp_path / "out"))
    assert ps.shape[0] == 7
    # error removal is monotone: each successive curve bounds the previous
    aps = [float(ps[t, :, :, 0].mean()) for t in range(7)]
    assert all(aps[i] <= aps[i + 1] + 1e-6 for i in range(6))
    assert (tmp_path / "out" / "bbox-allclass-allarea.png").exists()


def test_eval_metric_tool(tiny_workspace, tmp_path):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "evalmetric", osp.join(TOOLS, "analysis_tools", "eval_metric.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # perfect detections straight from the gt
    with open(osp.join(tiny_workspace["root"], "data", "ann.json")) as f:
        gt = json.load(f)
    dets = [dict(image_id=a["image_id"], category_id=a["category_id"],
                 bbox=a["bbox"], score=0.9) for a in gt["annotations"]]
    res = tmp_path / "res.json"
    with open(res, "w") as f:
        json.dump(dets, f)
    # add an evaluation section via cfg-options-free path: default coco std
    stats = mod.evaluate_file(tiny_workspace["cfg"], str(res))
    assert any(v == 1.0 for v in stats.values())  # perfect dets -> AP 1.0


def test_deployment_export_then_test(tiny_workspace, tmp_path, monkeypatch):
    """export_model.py -> deployment/test.py: the serialized StableHLO
    serving artifact runs the dataset through dataset.evaluate (reference
    tools/deployment/test.py role for ONNX/TensorRT artifacts)."""
    import importlib.util

    def run_tool(rel, argv):
        spec = importlib.util.spec_from_file_location(
            rel.replace("/", "_"), osp.join(TOOLS, rel))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        monkeypatch.setattr(sys, "argv", ["x"] + argv)
        mod.main()

    art = str(tmp_path / "m.stablehlo")
    run_tool("deployment/export_model.py",
             [tiny_workspace["cfg"], "--out", art, "--batch-size", "2"])
    assert osp.getsize(art) > 1000
    out_json = str(tmp_path / "dets.json")
    run_tool("deployment/test.py",
             [tiny_workspace["cfg"], art, "--split", "test",
              "--eval", "bbox", "--out", out_json])
    dets = json.load(open(out_json))
    assert isinstance(dets, list)


def test_robustness_eval_tool(tmp_path, monkeypatch):
    """robustness_eval.py summarizer (reference analysis_tools/
    robustness_eval.py): P / mPC / rPC from the saved table."""
    import importlib.util

    table = {"gaussian_noise": {"0": 0.5, "1": 0.4, "2": 0.3},
             "fog": {"0": 0.5, "1": 0.45, "2": 0.35}}
    f = tmp_path / "rob.json"
    f.write_text(json.dumps(table))
    spec = importlib.util.spec_from_file_location(
        "robustness_eval", osp.join(TOOLS, "analysis_tools",
                                    "robustness_eval.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    P, mPC, rPC, per = mod.summarize(table)
    assert abs(P - 0.5) < 1e-9
    assert abs(mPC - ((0.35 + 0.4) / 2)) < 1e-9
    monkeypatch.setattr(sys, "argv", ["x", str(f)])
    mod.main()


def test_housekeeping_tools(tmp_path):
    """exp/tools housekeeping parity (clear_tmp_pth.py + sync_log.py):
    checkpoint sweep keeps the newest epoch (file OR orbax dir) per work
    dir; sync_log collects the newest .log + log.json preserving paths."""
    import os
    import sys
    import os.path as osp
    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools",
                                "misc"))
    import clear_tmp_ckpt
    import sync_log

    wd = tmp_path / "work" / "expA"
    wd.mkdir(parents=True)
    for n in (1, 2, 3):
        (wd / f"epoch_{n}.ckpt").write_bytes(b"x")
    (wd / "epoch_4").mkdir()                      # orbax dir ckpt
    (wd / "epoch_4" / "blob").write_bytes(b"y")
    (wd / "latest.ckpt").write_bytes(b"x")
    removed = clear_tmp_ckpt.sweep([str(tmp_path / "work")])
    assert sorted(os.path.basename(r) for r in removed) == \
        ["epoch_1.ckpt", "epoch_2.ckpt", "epoch_3.ckpt"]
    assert (wd / "epoch_4").is_dir()              # newest kept
    assert (wd / "latest.ckpt").exists()          # alias untouched

    # sync_log: newest .log + log.json collected, relpaths preserved
    (wd / "a.log").write_text("old")
    (wd / "b.log").write_text("new")
    os.utime(wd / "a.log", (1, 1))
    (wd / "log.json").write_text("{}")
    dst = tmp_path / "synced"
    for p in sync_log.collect(str(tmp_path / "work")):
        rel = os.path.relpath(p, str(tmp_path / "work"))
        out = dst / rel
        out.parent.mkdir(parents=True, exist_ok=True)
        import shutil
        shutil.copy2(p, out)
    assert (dst / "expA" / "b.log").exists()
    assert not (dst / "expA" / "a.log").exists()
    assert (dst / "expA" / "log.json").exists()
