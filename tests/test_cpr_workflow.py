"""End-to-end CPR -> result2ann -> P2P workflow test (the reference's
two-stage point-supervision pipeline, SURVEY.md §3.2)."""
import json
import os.path as osp
import sys

import numpy as np
import pytest
from PIL import Image

import jax

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def point_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("cprwf")
    rng = np.random.RandomState(0)
    images, annotations, ann_id = [], [], 1
    for i in range(3):
        fn = f"img{i}.jpg"
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            root / fn)
        images.append(dict(id=i + 1, file_name=fn, width=64, height=64))
        for _ in range(3):
            x, y = rng.randint(5, 45), rng.randint(5, 45)
            w, h = rng.randint(6, 14), rng.randint(6, 14)
            annotations.append(dict(
                id=ann_id, image_id=i + 1, category_id=1,
                bbox=[float(x), float(y), float(w), float(h)],
                area=float(w * h), iscrowd=0))
            ann_id += 1
    ann_file = root / "train.json"
    with open(ann_file, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name="person")]), f)
    return dict(root=str(root), ann_file=str(ann_file))


def test_cpr_refine_to_annotation_workflow(point_dataset):
    from pointtinybenchmark_tpu.data import (CocoFmtDataset, DetCollator)
    from pointtinybenchmark_tpu.engine.test import run_refine_test
    from pointtinybenchmark_tpu.models import build_detector
    import jax.numpy as jnp
    from result2ann import result_to_annotation

    pipeline = [
        dict(type="LoadImageFromFile"),
        dict(type="LoadAnnotations", with_bbox=True),
        dict(type="Resize", scale_factor=[1.0], keep_ratio=True),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="Pad", size_divisor=32),
        dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels",
                                   "gt_true_bboxes", "gt_anns_id"]),
    ]
    # stage 0: point annotations -> pseudo boxes (+ true_bbox, ann_id)
    ds = CocoFmtDataset(
        ann_file=point_dataset["ann_file"], pipeline=pipeline,
        img_prefix=point_dataset["root"],
        noise_kwargs=dict(pseudo_wh=(8, 8), noise_rg=0.25), test_mode=True)
    sample = ds[0]
    assert "gt_true_bboxes" in sample and "gt_anns_id" in sample
    wh = sample["gt_bboxes"][:, 2:] - sample["gt_bboxes"][:, :2]
    np.testing.assert_allclose(wh, 8.0, atol=1e-4)  # pseudo boxes

    # stage 1: CPR refine (random weights — workflow plumbing test)
    model = build_detector(
        dict(type="BasicLocator",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0,
                       add_extra_convs="on_input", num_outs=1),
             bbox_head=dict(type="CPRHead", num_classes=1, in_channels=16,
                            feat_channels=16, stacked_convs=1, strides=[4],
                            norm_cfg=dict(type="GN", num_groups=4),
                            train_pts_extractor=dict(
                                pos_generator=dict(
                                    type="CirclePtFeatGenerator", radius=2),
                                neg_generator=dict(
                                    type="OutCirclePtFeatGenerator",
                                    radius=2)),
                            refine_pts_extractor=dict(
                                pos_generator=dict(
                                    type="CirclePtFeatGenerator", radius=2),
                                neg_generator=dict(
                                    type="OutCirclePtFeatGenerator",
                                    radius=2)),
                            point_refiner=dict(merge_th=0.0, refine_th=0.0))),
        None, dict(max_per_img=100))
    import jax.numpy as jnp
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    state = dict(params=variables["params"],
                 batch_stats=variables.get("batch_stats", {}))
    collator = DetCollator(pad_shape=(64, 64), max_gt=10)
    results = run_refine_test(model, state, ds, collator, pseudo_wh=(8, 8))
    assert len(results) == len(ds)
    assert all("anns_id" in r for r in results)

    # stage 1.5: join back into a training annotation by ann_id
    det_json = ds.format_results(results)
    assert all("ann_id" in d for d in det_json)
    new_ds, n_updated = result_to_annotation(
        point_dataset["ann_file"], det_json, new_wh=(8, 8))
    assert n_updated == 9
    for ann in new_ds["annotations"]:
        assert ann["bbox"][2] == 8 and ann["bbox"][3] == 8

    # stage 2 readiness: the refined json loads as a training dataset
    out_file = osp.join(point_dataset["root"], "refined.json")
    with open(out_file, "w") as f:
        json.dump(new_ds, f)
    ds2 = CocoFmtDataset(ann_file=out_file, pipeline=pipeline,
                         img_prefix=point_dataset["root"])
    assert len(ds2) == 3
