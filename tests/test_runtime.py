"""Runtime engine tests: eval-hook policy flags, checkpoint/resume, LR
schedule (reference tests/test_runtime/test_eval_hook.py pattern: scripted
metrics + call counting)."""
import json
import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("rt")
    data = root / "data"
    data.mkdir()
    rng = np.random.RandomState(0)
    images, annotations, ann_id = [], [], 1
    for i in range(4):
        fn = f"img{i}.jpg"
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            data / fn)
        images.append(dict(id=i + 1, file_name=fn, width=64, height=64))
        annotations.append(dict(id=ann_id, image_id=i + 1, category_id=1,
                                bbox=[10.0, 10.0, 12.0, 12.0], area=144.0,
                                iscrowd=0))
        ann_id += 1
    with open(data / "ann.json", "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name="p")]), f)

    from pointtinybenchmark_tpu.data import CocoFmtDataset
    from pointtinybenchmark_tpu.models import build_detector
    pipeline = [
        dict(type="LoadImageFromFile"),
        dict(type="LoadAnnotations", with_bbox=True),
        dict(type="Resize", scale_factor=[1.0], keep_ratio=True),
        dict(type="Normalize", mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375]),
        dict(type="Pad", size_divisor=32),
        dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels",
                                   "gt_bboxes_ignore"]),
    ]
    dataset = CocoFmtDataset(ann_file=str(data / "ann.json"),
                             pipeline=pipeline, img_prefix=str(data))
    model = build_detector(
        dict(type="BasicLocator",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=0,
                       add_extra_convs="on_input", num_outs=1),
             bbox_head=dict(type="P2PHead", num_classes=1, in_channels=16,
                            feat_channels=16, stacked_convs=1, strides=[4],
                            point_anchor=[(0.0, 0.0)],
                            norm_cfg=dict(type="GN", num_groups=4),
                            loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                          gamma=2.0, alpha=0.25,
                                          loss_weight=1.0),
                            loss_reg=dict(type="SmoothL1Loss", beta=0.111,
                                          loss_weight=0.5),
                            pts_gamma=1, reg_norm=1)),
        dict(neg_weight=1.0,
             assigner=dict(type="HungarianAssignerV2",
                           cls_costs=dict(type="FocalLossCost", weight=2.0),
                           reg_costs=dict(type="DisCostV2", weight=0.1,
                                          norm_with_img_wh=False), topk_k=1),
             sampler=dict(type="PseudoSampler")),
        dict(nms_pre=50, score_thr=0.01, pseudo_wh=(12, 12),
             nms=dict(type="nms", iou_threshold=0.3), max_per_img=10))
    cfg = dict(
        data=dict(samples_per_gpu=1),
        loader=dict(pad_shape=(64, 64), max_gt=5),
        optimizer=dict(type="Adam", lr=1e-3),
        lr_config=dict(policy="step", warmup=None, step=[100]),
        runner=dict(type="EpochBasedRunner", max_epochs=3),
        checkpoint_config=dict(interval=1),
        log_config=dict(interval=10),
        model=dict(backbone=dict(frozen_stages=-1)),
    )
    return dict(dataset=dataset, model=model, cfg=cfg, root=str(root))


def test_eval_hook_policy(tiny_setup):
    from pointtinybenchmark_tpu.engine import train_detector
    calls = []

    def eval_fn(state):
        calls.append(1)
        return {"AP50": 0.1 * len(calls)}

    cfg = dict(tiny_setup["cfg"])
    cfg["evaluation"] = dict(interval=2, do_first_eval=True,
                             do_final_eval=True)
    wd = osp.join(tiny_setup["root"], "wd_eval")
    train_detector(tiny_setup["model"], tiny_setup["dataset"], cfg, wd,
                   validate=True, eval_fn=eval_fn)
    # first eval + epoch2 + final(epoch3)
    assert len(calls) == 3


def test_checkpoint_resume_roundtrip(tiny_setup):
    from pointtinybenchmark_tpu.engine import (load_checkpoint,
                                               train_detector)
    cfg = dict(tiny_setup["cfg"])
    cfg["runner"] = dict(type="EpochBasedRunner", max_epochs=2)
    wd = osp.join(tiny_setup["root"], "wd_ckpt")
    state = train_detector(tiny_setup["model"], tiny_setup["dataset"], cfg,
                           wd)
    ck1 = osp.join(wd, "epoch_1.ckpt")
    ck2 = osp.join(wd, "epoch_2.ckpt")
    assert osp.exists(ck1) and osp.exists(ck2)
    assert osp.exists(osp.join(wd, "latest.ckpt"))
    assert osp.exists(osp.join(wd, "log.json"))

    # resume from epoch 1 -> trains only epoch 2
    cfg2 = dict(cfg)
    wd2 = osp.join(tiny_setup["root"], "wd_resume")
    state2 = train_detector(tiny_setup["model"], tiny_setup["dataset"], cfg2,
                            wd2, resume_from=ck1)
    assert osp.exists(osp.join(wd2, "epoch_2.ckpt"))
    assert not osp.exists(osp.join(wd2, "epoch_1.ckpt"))

    # load_from: weights only
    ck = load_checkpoint(ck2)
    assert "params" in ck["state"] and ck["meta"]["epoch"] == 2


def test_lr_schedule_step_and_warmup():
    from pointtinybenchmark_tpu.engine import build_lr_schedule
    sched = build_lr_schedule(
        0.01, dict(policy="step", warmup="linear", warmup_iters=10,
                   warmup_ratio=0.1, step=[1, 2]),
        iters_per_epoch=100, max_epochs=3)
    assert float(sched(0)) == pytest.approx(0.001)
    assert float(sched(9)) < 0.01
    assert float(sched(50)) == pytest.approx(0.01)       # epoch 0 after warmup
    assert float(sched(150)) == pytest.approx(0.001)     # epoch 1: x0.1
    assert float(sched(250)) == pytest.approx(0.0001)    # epoch 2: x0.01


def test_frozen_param_mask():
    from pointtinybenchmark_tpu.engine.optimizer import frozen_param_mask
    params = {"backbone_m": {"layer1_block0": {"Conv_0": {"kernel":
                                                          np.ones(3)}},
                             "layer2_block0": {"Conv_0": {"kernel":
                                                          np.ones(3)}}},
              "neck_m": {"Conv_0": {"kernel": np.ones(3)}}}
    mask = frozen_param_mask(params, frozen_stages=1)
    assert mask["backbone_m"]["layer1_block0"]["Conv_0"]["kernel"] is False
    assert mask["backbone_m"]["layer2_block0"]["Conv_0"]["kernel"] is True
    assert mask["neck_m"]["Conv_0"]["kernel"] is True


def test_paramwise_cfg():
    """mmcv DefaultOptimizerConstructor parity: custom_keys lr_mult scales
    the update; bias_lr_mult applies to non-norm biases; norm_decay_mult
    kills weight decay on norm params."""
    import jax
    import jax.numpy as jnp
    from pointtinybenchmark_tpu.engine.optimizer import build_optimizer

    params = {
        "backbone_m": {"conv1": {"kernel": jnp.ones((2, 2))}},
        "head": {"conv": {"kernel": jnp.ones((2, 2)),
                          "bias": jnp.ones((2,))},
                 "BatchNorm_0": {"scale": jnp.ones((2,))}},
    }
    tx = build_optimizer(
        dict(type="SGD", lr=1.0, momentum=0.0, weight_decay=0.0,
             paramwise_cfg=dict(
                 custom_keys={"backbone": dict(lr_mult=0.1)},
                 bias_lr_mult=2.0)))
    st = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update(g, st, params)
    np.testing.assert_allclose(
        np.asarray(upd["backbone_m"]["conv1"]["kernel"]), -0.1)
    np.testing.assert_allclose(np.asarray(upd["head"]["conv"]["bias"]), -2.0)
    np.testing.assert_allclose(np.asarray(upd["head"]["conv"]["kernel"]),
                               -1.0)

    # decay_mult: norm params exempt from wd, others decayed (grad=0 probe)
    tx = build_optimizer(
        dict(type="SGD", lr=1.0, weight_decay=0.5,
             paramwise_cfg=dict(norm_decay_mult=0.0)))
    st = tx.init(params)
    z = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd, _ = tx.update(z, st, params)
    np.testing.assert_allclose(
        np.asarray(upd["head"]["BatchNorm_0"]["scale"]), 0.0)
    np.testing.assert_allclose(
        np.asarray(upd["head"]["conv"]["kernel"]), -0.5)

    # AdamW decoupled decay composes with custom_keys lr_mult
    tx = build_optimizer(
        dict(type="AdamW", lr=1e-2, weight_decay=1e-4,
             paramwise_cfg=dict(
                 custom_keys={"backbone": dict(lr_mult=0.1)})))
    st = tx.init(params)
    upd, _ = tx.update(g, st, params)
    r = (np.asarray(upd["backbone_m"]["conv1"]["kernel"])
         / np.asarray(upd["head"]["conv"]["kernel"]))
    np.testing.assert_allclose(r, 0.1, rtol=1e-5)


def test_nan_step_skips_update_and_freezes_state():
    """Per-step NaN guard (reference LogNanStopHook apis/train.py:177-203):
    inject a NaN batch at step k; the in-graph update must be skipped so
    params at stop equal params at step k-1, and the sticky nan_seen flag
    must surface through metrics."""
    import jax
    import optax
    import flax.linen as nn
    from pointtinybenchmark_tpu.engine.train import make_train_step

    class Toy(nn.Module):
        def setup(self):
            self.w = self.param("w", nn.initializers.ones, (3,))

        def __call__(self, img, train=False):
            return self.w.sum() * jnp.mean(img)

        def forward_train(self, img, batch):
            return {"loss_main": self.w.sum() * jnp.mean(img)}

    model = Toy()
    img = jnp.ones((1, 8, 8, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)["params"]
    tx = optax.sgd(0.1)
    state = dict(params=params, batch_stats={}, opt_state=tx.init(params),
                 step=jnp.int32(0), nan_seen=jnp.bool_(False))
    step = make_train_step(model, tx)
    rng = jax.random.PRNGKey(1)

    # two finite steps
    state, m = step(state, {"img": img}, rng)
    state, m = step(state, {"img": img}, rng)
    assert not bool(m["nan_seen"])
    w_before = np.asarray(state["params"]["w"]).copy()

    # NaN step: update skipped, flag raised
    nan_img = jnp.full_like(img, jnp.nan)
    state, m = step(state, {"img": nan_img}, rng)
    assert bool(m["nan_seen"])
    assert not np.isfinite(float(m["loss"]))
    np.testing.assert_array_equal(np.asarray(state["params"]["w"]), w_before)

    # later finite steps do NOT update either (state frozen until host exit)
    state, m = step(state, {"img": img}, rng)
    assert bool(m["nan_seen"])
    np.testing.assert_array_equal(np.asarray(state["params"]["w"]), w_before)


def test_iter_based_runner(tiny_setup):
    """IterBasedRunner (reference mmcv runner; e.g.
    faster_rcnn_r50_caffe_fpn_mstrain_90k_coco.py): max_iters total steps,
    checkpoint/eval intervals in ITERATIONS, iter_N.ckpt artifacts, lr
    step boundaries interpreted as iterations."""
    from pointtinybenchmark_tpu.engine import train_detector
    from pointtinybenchmark_tpu.engine.optimizer import build_lr_schedule

    calls = []

    def eval_fn(state):
        calls.append(1)
        return {"AP50": 0.5}

    cfg = dict(tiny_setup["cfg"])
    # dataset has 4 imgs, b=1 -> 4 iters/epoch; stop mid-epoch-2 at 6
    cfg["runner"] = dict(type="IterBasedRunner", max_iters=6)
    cfg["checkpoint_config"] = dict(interval=2)
    cfg["evaluation"] = dict(interval=3, do_final_eval=True)
    wd = osp.join(tiny_setup["root"], "wd_iter")
    train_detector(tiny_setup["model"], tiny_setup["dataset"], cfg, wd,
                   validate=True, eval_fn=eval_fn)
    names = sorted(os.listdir(wd))
    assert "iter_2.ckpt" in names and "iter_4.ckpt" in names \
        and "iter_6.ckpt" in names, names
    # eval at iter 3 + final at stop
    assert len(calls) == 2

    # lr step boundaries in iterations when by_epoch=False
    sch = build_lr_schedule(1.0, dict(policy="step", step=[4]),
                            iters_per_epoch=4, max_epochs=2, by_epoch=False)
    assert float(sch(3)) == 1.0 and abs(float(sch(5)) - 0.1) < 1e-6
    sch_e = build_lr_schedule(1.0, dict(policy="step", step=[1]),
                              iters_per_epoch=4, max_epochs=2, by_epoch=True)
    assert float(sch_e(3)) == 1.0 and abs(float(sch_e(4)) - 0.1) < 1e-6


def test_orbax_checkpoint_backend(tiny_setup):
    """checkpoint_config backend='orbax' (+async): the production
    multi-host checkpoint path (SURVEY §5.4 TPU-equiv); resume_from loads
    the directory artifact transparently via load_checkpoint_any."""
    from pointtinybenchmark_tpu.engine import train_detector

    cfg = dict(tiny_setup["cfg"])
    cfg["runner"] = dict(type="EpochBasedRunner", max_epochs=1)
    cfg["checkpoint_config"] = dict(interval=1, backend="orbax",
                                    async_save=True)
    wd = osp.join(tiny_setup["root"], "wd_orbax")
    train_detector(tiny_setup["model"], tiny_setup["dataset"], cfg, wd)
    ck = osp.join(wd, "epoch_1.ckpt")
    assert osp.isdir(ck)  # orbax artifacts are directories

    from pointtinybenchmark_tpu.engine import load_checkpoint_any
    out = load_checkpoint_any(ck)
    assert out["meta"]["epoch"] == 1
    assert "params" in out["state"]

    # resume from the orbax artifact continues the run
    cfg2 = dict(cfg)
    cfg2["runner"] = dict(type="EpochBasedRunner", max_epochs=2)
    train_detector(tiny_setup["model"], tiny_setup["dataset"], cfg2, wd,
                   resume_from=ck)
    assert osp.isdir(osp.join(wd, "epoch_2.ckpt"))


def test_model_pretrained_loading(tiny_setup, caplog):
    """model.pretrained (reference init_cfg=Pretrained): a local
    backbone-only checkpoint (torch2jax artifact shape) merges into
    backbone_m before training; non-local URLs warn with the converter
    pointer instead of failing."""
    import jax
    import numpy as np

    from pointtinybenchmark_tpu.engine import (save_checkpoint,
                                               train_detector)
    from pointtinybenchmark_tpu.engine.train import init_model

    # build a backbone-only ckpt with recognizable values
    sample = dict(img=jnp.zeros((1, 64, 64, 3)))
    params, stats = init_model(tiny_setup["model"], sample)
    bb = jax.tree_util.tree_map(lambda a: jnp.full_like(a, 0.123),
                                params["backbone_m"])
    ck = osp.join(tiny_setup["root"], "bb.ckpt")
    save_checkpoint(ck, {"params": bb, "batch_stats": {}})

    cfg = dict(tiny_setup["cfg"])
    cfg["runner"] = dict(type="EpochBasedRunner", max_epochs=1)
    cfg["model"] = dict(cfg.get("model", {}), pretrained=ck,
                        backbone=dict(frozen_stages=4))  # freeze: keep values
    wd = osp.join(tiny_setup["root"], "wd_pre")
    state = train_detector(tiny_setup["model"], tiny_setup["dataset"], cfg,
                           wd)
    leaf = jax.tree_util.tree_leaves(state["params"]["backbone_m"])[0]
    np.testing.assert_allclose(np.asarray(leaf).ravel()[0], 0.123, atol=1e-6)

    # non-local path -> warning, not failure
    cfg2 = dict(cfg)
    cfg2["model"] = dict(cfg["model"], pretrained="torchvision://resnet50")
    train_detector(tiny_setup["model"], tiny_setup["dataset"], cfg2,
                   osp.join(tiny_setup["root"], "wd_pre2"))
