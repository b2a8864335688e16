"""Cross-framework TRAINING-DYNAMICS parity harness (VERDICT r4 item 1).

Builds the same small Adap-flavored detector twice — the reference torch
stack (the tests' ResNet18 mirror + the exec'd reference FPN / RetinaHead /
P2PHead, tests/reference_loader.py) and our JAX stack — from IDENTICAL
initialization (torch2jax conversion), trains both on an identical
deterministic synthetic tiny-object dataset with identical optimizer
semantics (SGD momentum 0.9, weight_decay 1e-4, linear-warmup step LR,
global-norm grad clip — reference apis/train.py:37-176 + mmcv
StepLrUpdaterHook / OptimizerHook), and compares per-step loss trajectories
plus final AP on a held-out split evaluated by the SAME evaluator
(evaluation/cocoeval.py tiny standard).

This converts the single-snapshot goldens (test_detector_golden /
test_point_golden) into evidence that the two frameworks *train to the same
place* — the closest achievable proxy for TinyPerson AP parity in an
environment without the real dataset.

Everything here is test scaffolding; nothing ships in the package.
"""
from __future__ import annotations

import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), "..",
                            "tools", "model_converters"))
sys.path.insert(0, osp.dirname(__file__))

IMG_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMG_STD = np.array([58.395, 57.12, 57.375], np.float32)

# Adap TinyPerson protocol shapes (octave_base_scale=2, strides from 4),
# scaled to CPU-tractable channel counts (backbone base 8, head c 16).
ADAP_ANCHOR = dict(type="AnchorGenerator", octave_base_scale=2,
                   scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                   strides=[4, 8, 16, 32, 64])
DELTA_CODER = dict(type="DeltaXYWHBBoxCoder",
                   target_means=[0.0, 0.0, 0.0, 0.0],
                   target_stds=[1.0, 1.0, 1.0, 1.0])
RETINA_TRAIN = dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                  neg_iou_thr=0.4, min_pos_iou=0.0,
                                  ignore_iof_thr=-1),
                    allowed_border=-1, pos_weight=-1, debug=False)
RETINA_TEST = dict(nms_pre=300, score_thr=0.05,
                   nms=dict(type="nms", iou_threshold=0.5), max_per_img=100)
LOSS_CLS = dict(type="FocalLoss", use_sigmoid=True, gamma=2.0, alpha=0.25,
                loss_weight=1.0)
LOSS_BBOX = dict(type="L1Loss", loss_weight=1.0)

# optimizer semantics under test (reference apis/train.py + tiny "-c" clip)
OPT = dict(lr=0.01, momentum=0.9, weight_decay=1e-4, grad_clip=35.0)
LR_CFG = dict(warmup_iters=50, warmup_ratio=0.1, gamma=0.1)


# ---------------------------------------------------------------------
# deterministic synthetic tiny-object data
# ---------------------------------------------------------------------

def make_tiny_dataset(n_imgs: int, hw=(256, 320), seed: int = 0,
                      n_obj=(4, 12)):
    """TinyPerson-like synthetic scenes: textured background + bright
    person-shaped (tall) rectangles, absolute sizes ~3-22 px (the
    TinyPerson size regime). Deterministic in `seed`.

    Returns dict(images=(n,h,w,3) float32 normalized, gts=list[(g,4) xyxy],
    labels=list[(g,) int64]).
    """
    h, w = hw
    rng = np.random.RandomState(seed)
    images, gts, labels = [], [], []
    for _ in range(n_imgs):
        # low-frequency background texture + pixel noise
        coarse = rng.uniform(40, 180, (h // 32, w // 32, 3))
        bg = np.kron(coarse, np.ones((32, 32, 1)))[:h, :w]
        img = bg + rng.randn(h, w, 3) * 8.0
        g = rng.randint(n_obj[0], n_obj[1] + 1)
        boxes = []
        for _ in range(g):
            bw = float(np.exp(rng.normal(np.log(7.0), 0.35)))
            bw = min(max(bw, 3.0), 14.0)
            bh = min(bw * rng.uniform(1.4, 2.2), 26.0)
            x1 = rng.uniform(2, w - bw - 2)
            y1 = rng.uniform(2, h - bh - 2)
            x2, y2 = x1 + bw, y1 + bh
            iy1, iy2 = int(round(y1)), int(round(y2))
            ix1, ix2 = int(round(x1)), int(round(x2))
            tint = rng.uniform(60, 110, (3,))
            img[iy1:iy2, ix1:ix2] = np.clip(
                img[iy1:iy2, ix1:ix2] + tint, 0, 255)
            boxes.append([x1, y1, x2, y2])
        img = np.clip(img, 0, 255)
        images.append((img.astype(np.float32) - IMG_MEAN) / IMG_STD)
        boxes = np.asarray(boxes, np.float32)
        gts.append(boxes)
        labels.append(np.zeros((len(boxes),), np.int64))
    return dict(images=np.stack(images), gts=gts, labels=labels, hw=hw)


def batch_order(n: int, batch_size: int, steps: int, seed: int = 123):
    """Identical batching for both frameworks: per-epoch seeded permutation."""
    rng = np.random.RandomState(seed)
    order, out = [], []
    while len(out) < steps:
        if len(order) < batch_size:
            order = list(rng.permutation(n))
        out.append([order.pop(0) for _ in range(batch_size)])
    return out[:steps]


def lr_at(step: int, base_lr: float, step_iters, lr_cfg=LR_CFG) -> float:
    """Mirror of engine/optimizer.py::build_lr_schedule (policy='step',
    warmup='linear', by_epoch=False) in plain python for the torch loop."""
    mult = 1.0
    for s in step_iters:
        if step >= s:
            mult *= lr_cfg["gamma"]
    lr = base_lr * mult
    wi = lr_cfg["warmup_iters"]
    if step < wi:
        k = step / wi
        warm = base_lr * (lr_cfg["warmup_ratio"]
                          + (1 - lr_cfg["warmup_ratio"]) * k)
        lr = min(warm, lr)
    return lr


# ---------------------------------------------------------------------
# torch reference stack
# ---------------------------------------------------------------------

def _focal_bias(prior: float = 0.01) -> float:
    return float(-np.log((1 - prior) / prior))


def make_torch_retina(seed: int = 0, base: int = 8, c: int = 16,
                      stacked: int = 2, num_classes: int = 1):
    """Reference torch stack: ResNet18 mirror -> exec'd reference FPN ->
    exec'd reference RetinaHead, mmdet state_dict naming (backbone./neck./
    bbox_head.) so torch2jax converts it wholesale."""
    import torch
    import torch.nn as tnn

    import reference_loader as rl
    from test_torch2jax import _TorchResNet18

    torch.manual_seed(seed)
    chans = [base, base * 2, base * 4, base * 8]

    class _Det(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = _TorchResNet18(base=base)
            self.neck = rl.ref_fpn().FPN(
                in_channels=chans, out_channels=c, num_outs=5,
                start_level=0, add_extra_convs="on_input")
            self.bbox_head = rl.ref_dense_heads().RetinaHead(
                num_classes=num_classes, in_channels=c, feat_channels=c,
                stacked_convs=stacked, anchor_generator=dict(ADAP_ANCHOR),
                bbox_coder=dict(DELTA_CODER), loss_cls=dict(LOSS_CLS),
                loss_bbox=dict(LOSS_BBOX),
                train_cfg=rl.make_cfg(RETINA_TRAIN),
                test_cfg=rl.make_cfg(RETINA_TEST))

        def forward(self, img):
            return self.bbox_head(self.neck(self.backbone(img)))

    det = _Det()
    # reference init essentials: focal prior bias on the cls output
    # (mmdet bias_init_with_prob(0.01)), small normal on head convs
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for m in det.bbox_head.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.normal_(0.0, 0.01, generator=g)
                if m.bias is not None:
                    m.bias.zero_()
        det.bbox_head.retina_cls.bias.fill_(_focal_bias(0.01))
    return det


def set_norm_eval(det):
    """mmdet ResNet norm_eval=True: BN layers stay in eval mode (running
    stats frozen, batch stats unused) while their affine params train."""
    import torch.nn as tnn
    for m in det.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.SyncBatchNorm)):
            m.eval()


def torch_state_to_jax(det, depth: int = 18):
    from torch2jax import convert_detector_state_dict
    sd = {k: v.detach().numpy() for k, v in det.state_dict().items()}
    params, stats, unmapped = convert_detector_state_dict(sd, depth=depth)
    assert not unmapped, unmapped
    return params, stats


def torch_losses(det, imgs_np, gts, labels, hw):
    """Generic dense-head loss: head outputs splat into head.loss
    (retina: (cls, reg); fcos: (cls, reg, centerness))."""
    import torch
    img_metas = [dict(img_shape=tuple(hw) + (3,), pad_shape=tuple(hw) + (3,),
                      scale_factor=np.ones(4, np.float32))
                 for _ in range(len(gts))]
    t_img = torch.from_numpy(imgs_np.transpose(0, 3, 1, 2)).contiguous()
    outs = det(t_img)
    ld = det.bbox_head.loss(
        *outs, [torch.from_numpy(np.ascontiguousarray(g)) for g in gts],
        [torch.from_numpy(np.ascontiguousarray(l)) for l in labels],
        img_metas)
    total = sum(sum(v) if isinstance(v, (list, tuple)) else v
                for v in ld.values())
    return total, ld


def train_torch(det, data, order, step_iters, opt_cfg=OPT,
                log_every: int = 0):
    """Reference-side loop: mmdet OptimizerHook semantics — zero_grad,
    backward, clip_grad_norm_(max_norm, 2), SGD(momentum, wd) step, with
    the step-LR+warmup schedule applied per iteration."""
    import torch

    torch.manual_seed(0)
    det.train()
    set_norm_eval(det)
    opt = torch.optim.SGD(det.parameters(), lr=opt_cfg["lr"],
                          momentum=opt_cfg["momentum"],
                          weight_decay=opt_cfg["weight_decay"])
    images = data["images"]
    losses = []
    for step, idxs in enumerate(order):
        lr = lr_at(step, opt_cfg["lr"], step_iters)
        for grp in opt.param_groups:
            grp["lr"] = lr
        gts = [data["gts"][i] for i in idxs]
        labels = [data["labels"][i] for i in idxs]
        total, _ = torch_losses(det, images[idxs], gts, labels, data["hw"])
        opt.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(det.parameters(),
                                       opt_cfg["grad_clip"], norm_type=2)
        opt.step()
        losses.append(float(total.detach()))
        if log_every and step % log_every == 0:
            print(f"  torch step {step}: loss {losses[-1]:.4f} lr {lr:.5f}")
    return np.asarray(losses)


# ---------------------------------------------------------------------
# our JAX stack
# ---------------------------------------------------------------------

def make_jax_retina(base: int = 8, c: int = 16, stacked: int = 2,
                    num_classes: int = 1):
    from pointtinybenchmark_tpu.models import build_detector
    chans = [base, base * 2, base * 4, base * 8]
    model_cfg = dict(
        type="RetinaNet",
        backbone=dict(type="ResNet", depth=18, base_channels=base,
                      norm_eval=True, frozen_stages=-1),
        neck=dict(type="FPN", in_channels=chans, out_channels=c,
                  num_outs=5, start_level=0, add_extra_convs="on_input"),
        bbox_head=dict(type="RetinaHead", num_classes=num_classes,
                       in_channels=c, feat_channels=c, stacked_convs=stacked,
                       anchor_generator=dict(ADAP_ANCHOR),
                       bbox_coder=dict(DELTA_CODER), loss_cls=dict(LOSS_CLS),
                       loss_bbox=dict(LOSS_BBOX)))
    return build_detector(model_cfg, dict(RETINA_TRAIN), dict(RETINA_TEST))


def pad_gts(gts, labels, gmax: int | None = None):
    b = len(gts)
    gmax = gmax or max(max(len(g) for g in gts), 1)
    gt_b = np.zeros((b, gmax, 4), np.float32)
    gt_l = np.zeros((b, gmax), np.int32)
    gt_v = np.zeros((b, gmax), bool)
    for i, (g, l) in enumerate(zip(gts, labels)):
        gt_b[i, :len(g)] = g
        gt_l[i, :len(l)] = l
        gt_v[i, :len(g)] = True
    return gt_b, gt_l, gt_v


def train_jax(model, init_params, init_stats, data, order, step_iters,
              opt_cfg=OPT, gmax: int = 16, log_every: int = 0):
    """Our side uses the REAL package train path: engine/optimizer.py
    build_optimizer (clip -> wd -> momentum -> schedule, torch ordering)
    + engine/train.py make_train_step (donated jitted step, NaN guard)."""
    import jax
    import jax.numpy as jnp

    from pointtinybenchmark_tpu.engine.optimizer import build_optimizer
    from pointtinybenchmark_tpu.engine.train import make_train_step

    tx = build_optimizer(
        dict(type="SGD", lr=opt_cfg["lr"], momentum=opt_cfg["momentum"],
             weight_decay=opt_cfg["weight_decay"]),
        optimizer_config=dict(grad_clip=dict(max_norm=opt_cfg["grad_clip"],
                                             norm_type=2)),
        lr_config=dict(policy="step", warmup="linear",
                       warmup_iters=LR_CFG["warmup_iters"],
                       warmup_ratio=LR_CFG["warmup_ratio"],
                       gamma=LR_CFG["gamma"], step=list(step_iters)),
        iters_per_epoch=1, max_epochs=1, by_epoch=False)
    step_fn = make_train_step(model, tx)
    state = dict(params=init_params, batch_stats=init_stats,
                 opt_state=tx.init(init_params), step=jnp.asarray(0))

    h, w = data["hw"]
    images = data["images"]
    rng = jax.random.PRNGKey(0)
    losses = []
    for step, idxs in enumerate(order):
        gts = [data["gts"][i] for i in idxs]
        labels = [data["labels"][i] for i in idxs]
        gt_b, gt_l, gt_v = pad_gts(gts, labels, gmax)
        batch = dict(
            img=jnp.asarray(images[idxs]),
            gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
            gt_valid=jnp.asarray(gt_v),
            img_shape=jnp.tile(jnp.asarray([[h, w]], jnp.int32),
                               (len(idxs), 1)))
        state, metrics = step_fn(state, batch, rng)
        losses.append(float(metrics["loss"]))
        if log_every and step % log_every == 0:
            print(f"  jax step {step}: loss {losses[-1]:.4f}")
    return np.asarray(losses), state


# ---------------------------------------------------------------------
# FCOS pair (anchor-free; Adap compressed regress ranges)
# ---------------------------------------------------------------------

ADAP_RANGES = ((-1, 16), (16, 32), (32, 64), (64, 128), (128, 1e8))
FCOS_LOSS_BBOX = dict(type="IoULoss", loss_weight=1.0)
FCOS_LOSS_CTR = dict(type="CrossEntropyLoss", use_sigmoid=True,
                     loss_weight=1.0)
FCOS_NORM = dict(type="GN", num_groups=4, requires_grad=True)


def make_torch_fcos(seed: int = 0, base: int = 8, c: int = 16,
                    stacked: int = 2, num_classes: int = 1):
    """Reference torch FCOS stack (exec'd fcos_head.py loss path live)."""
    import torch
    import torch.nn as tnn

    import reference_loader as rl
    from test_torch2jax import _TorchResNet18

    torch.manual_seed(seed)
    chans = [base, base * 2, base * 4, base * 8]

    class _Det(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = _TorchResNet18(base=base)
            self.neck = rl.ref_fpn().FPN(
                in_channels=chans, out_channels=c, num_outs=5,
                start_level=0, add_extra_convs="on_input")
            self.bbox_head = rl.ref_fcos_head().FCOSHead(
                num_classes=num_classes, in_channels=c, feat_channels=c,
                stacked_convs=stacked, strides=[4, 8, 16, 32, 64],
                regress_ranges=ADAP_RANGES,
                norm_cfg=dict(FCOS_NORM), loss_cls=dict(LOSS_CLS),
                loss_bbox=dict(FCOS_LOSS_BBOX),
                loss_centerness=dict(FCOS_LOSS_CTR),
                train_cfg=None, test_cfg=rl.make_cfg(RETINA_TEST))

        def forward(self, img):
            return self.bbox_head(self.neck(self.backbone(img)))

    det = _Det()
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for m in det.bbox_head.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.normal_(0.0, 0.01, generator=g)
                if m.bias is not None:
                    m.bias.zero_()
        det.bbox_head.conv_cls.bias.fill_(_focal_bias(0.01))
    return det


def make_jax_fcos(base: int = 8, c: int = 16, stacked: int = 2,
                  num_classes: int = 1):
    from pointtinybenchmark_tpu.models import build_detector
    chans = [base, base * 2, base * 4, base * 8]
    model_cfg = dict(
        type="FCOS",
        backbone=dict(type="ResNet", depth=18, base_channels=base,
                      norm_eval=True, frozen_stages=-1),
        neck=dict(type="FPN", in_channels=chans, out_channels=c,
                  num_outs=5, start_level=0, add_extra_convs="on_input"),
        bbox_head=dict(type="FCOSHead", num_classes=num_classes,
                       in_channels=c, feat_channels=c,
                       stacked_convs=stacked, strides=[4, 8, 16, 32, 64],
                       regress_ranges=ADAP_RANGES,
                       norm_cfg=dict(FCOS_NORM), loss_cls=dict(LOSS_CLS),
                       loss_bbox=dict(FCOS_LOSS_BBOX),
                       loss_centerness=dict(FCOS_LOSS_CTR)))
    return build_detector(model_cfg, None, dict(RETINA_TEST))


def run_fcos_experiment(steps: int = 300, batch_size: int = 2,
                        n_train: int = 64, n_val: int = 16,
                        hw=(256, 320), seed: int = 0, log_every: int = 0):
    import torch
    torch.set_num_threads(max(1, os.cpu_count() or 1))

    train = make_tiny_dataset(n_train, hw=hw, seed=seed)
    val = make_tiny_dataset(n_val, hw=hw, seed=seed + 1000)
    order = batch_order(n_train, batch_size, steps)
    step_iters = [int(steps * 2 / 3), int(steps * 5 / 6)]

    det = make_torch_fcos(seed=seed)
    params, stats = torch_state_to_jax(det)
    model = make_jax_fcos()

    t_losses = train_torch(det, train, order, step_iters,
                           log_every=log_every)
    j_losses, state = train_jax(model, params, stats, train, order,
                                step_iters, log_every=log_every)

    ap_t = eval_torch_ap(det, val)
    ap_j = eval_jax_ap(model, state, val)
    return dict(torch_losses=t_losses, jax_losses=j_losses,
                ap_torch=ap_t, ap_jax=ap_j, step_iters=step_iters)


# ---------------------------------------------------------------------
# P2P flagship pair (point localization; HungarianAssignerV2 topk_k=1)
# ---------------------------------------------------------------------

P2P_TRAIN = dict(
    neg_weight=1.0,
    assigner=dict(type="HungarianAssignerV2",
                  cls_costs=dict(type="FocalLossCost", weight=2.0),
                  reg_costs=dict(type="DisCostV2", weight=0.1,
                                 norm_with_img_wh=False),
                  topk_k=1),     # k=1: scipy LSA and our auction agree
    sampler=dict(type="PseudoSampler"))
P2P_TEST = dict(nms_pre=300, score_thr=0.05, pseudo_wh=(16, 16),
                nms=dict(type="nms", iou_threshold=0.3), max_per_img=100)
P2P_LOSS_REG = dict(type="SmoothL1Loss", beta=1.0 / 9.0, loss_weight=0.5)
P2P_NORM = dict(type="GN", num_groups=4, requires_grad=True)


def make_torch_p2p(seed: int = 0, base: int = 8, c: int = 16,
                   stacked: int = 2):
    """Reference torch P2P stack: ResNet18 mirror -> reference FPN
    (single stride-4 output) -> exec'd reference P2PHead."""
    import torch
    import torch.nn as tnn

    import reference_loader as rl
    from test_torch2jax import _TorchResNet18

    torch.manual_seed(seed)
    chans = [base, base * 2, base * 4, base * 8]

    class _Det(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = _TorchResNet18(base=base)
            self.neck = rl.ref_fpn().FPN(
                in_channels=chans, out_channels=c, num_outs=1,
                start_level=0, add_extra_convs="on_input")
            # num_outs=1 leaves fpn_convs[1:] unused: torch SGD skips
            # params with grad=None while optax decays every leaf — prune
            # so the trained/decayed parameter sets are identical (our FPN
            # only materializes the convs it uses)
            self.neck.fpn_convs = tnn.ModuleList(
                list(self.neck.fpn_convs)[:1])
            self.bbox_head = rl.ref_p2p_head().P2PHead(
                num_classes=1, in_channels=c, feat_channels=c,
                stacked_convs=stacked, strides=[4],
                point_anchor=[[0.0, 0.0]], pts_gamma=1, reg_norm=1,
                norm_cfg=rl.make_cfg(P2P_NORM), loss_cls=dict(LOSS_CLS),
                loss_reg=dict(P2P_LOSS_REG),
                train_cfg=rl.make_cfg(P2P_TRAIN),
                test_cfg=rl.make_cfg(P2P_TEST))

        def forward(self, img):
            return self.bbox_head([self.neck(self.backbone(img))[0]])

    det = _Det()
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for m in det.bbox_head.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.normal_(0.0, 0.01, generator=g)
                if m.bias is not None:
                    m.bias.zero_()
        det.bbox_head.cls_out.bias.fill_(_focal_bias(0.01))
    return det


def make_jax_p2p(base: int = 8, c: int = 16, stacked: int = 2):
    from pointtinybenchmark_tpu.models import build_detector
    chans = [base, base * 2, base * 4, base * 8]
    model_cfg = dict(
        type="BasicLocator",
        backbone=dict(type="ResNet", depth=18, base_channels=base,
                      norm_eval=True, frozen_stages=-1),
        neck=dict(type="FPN", in_channels=chans, out_channels=c,
                  num_outs=1, start_level=0, add_extra_convs="on_input"),
        bbox_head=dict(type="P2PHead", num_classes=1, in_channels=c,
                       feat_channels=c, stacked_convs=stacked, strides=[4],
                       point_anchor=[(0.0, 0.0)], pts_gamma=1.0,
                       reg_norm=1.0, norm_cfg=dict(P2P_NORM),
                       loss_cls=dict(LOSS_CLS),
                       loss_reg=dict(P2P_LOSS_REG)))
    return build_detector(model_cfg, dict(P2P_TRAIN), dict(P2P_TEST))


def torch_p2p_losses(det, imgs_np, gts, labels, hw):
    import torch
    b = len(gts)
    img_metas = [dict(img_shape=tuple(hw) + (3,), pad_shape=tuple(hw) + (3,),
                      scale_factor=np.ones(4, np.float32))
                 for _ in range(b)]
    t_img = torch.from_numpy(imgs_np.transpose(0, 3, 1, 2)).contiguous()
    cls, pts = det(t_img)
    ld = det.bbox_head.loss(
        cls, pts, [torch.from_numpy(np.ascontiguousarray(g)) for g in gts],
        [torch.from_numpy(np.ascontiguousarray(l)) for l in labels],
        img_metas, gt_bboxes_ignore=[torch.zeros((0, 4)) for _ in range(b)])
    total = sum(sum(v) if isinstance(v, (list, tuple)) else v
                for v in ld.values())
    return total, ld


def run_p2p_experiment(steps: int = 300, batch_size: int = 2,
                       n_train: int = 64, n_val: int = 16,
                       hw=(256, 320), seed: int = 0, log_every: int = 0):
    import torch
    torch.set_num_threads(max(1, os.cpu_count() or 1))

    train = make_tiny_dataset(n_train, hw=hw, seed=seed)
    val = make_tiny_dataset(n_val, hw=hw, seed=seed + 1000)
    order = batch_order(n_train, batch_size, steps)
    step_iters = [int(steps * 2 / 3), int(steps * 5 / 6)]

    det = make_torch_p2p(seed=seed)
    params, stats = torch_state_to_jax(det)
    model = make_jax_p2p()

    t_losses = train_torch_p2p(det, train, order, step_iters,
                               log_every=log_every)
    j_losses, state = train_jax(model, params, stats, train, order,
                                step_iters, log_every=log_every)

    ap_t = eval_torch_point_ap(det, val)
    ap_j = eval_jax_point_ap(model, state, val)
    return dict(torch_losses=t_losses, jax_losses=j_losses,
                ap_torch=ap_t, ap_jax=ap_j, step_iters=step_iters)


def train_torch_p2p(det, data, order, step_iters, opt_cfg=OPT,
                    log_every: int = 0):
    import torch

    torch.manual_seed(0)
    det.train()
    set_norm_eval(det)
    opt = torch.optim.SGD(det.parameters(), lr=opt_cfg["lr"],
                          momentum=opt_cfg["momentum"],
                          weight_decay=opt_cfg["weight_decay"])
    images = data["images"]
    losses = []
    for step, idxs in enumerate(order):
        lr = lr_at(step, opt_cfg["lr"], step_iters)
        for grp in opt.param_groups:
            grp["lr"] = lr
        gts = [data["gts"][i] for i in idxs]
        labels = [data["labels"][i] for i in idxs]
        total, _ = torch_p2p_losses(det, images[idxs], gts, labels,
                                    data["hw"])
        opt.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(det.parameters(),
                                       opt_cfg["grad_clip"], norm_type=2)
        opt.step()
        losses.append(float(total.detach()))
        if log_every and step % log_every == 0:
            print(f"  torch step {step}: loss {losses[-1]:.4f} lr {lr:.5f}")
    return np.asarray(losses)


def _point_ap(gt_dict, det_rows):
    from pointtinybenchmark_tpu.data.coco import COCO
    from pointtinybenchmark_tpu.evaluation.location_eval import (
        LocationEvaluator)
    ev = LocationEvaluator()
    return ev(det_rows, COCO(gt_dict))


def eval_torch_point_ap(det, val):
    import torch
    det.eval()
    set_norm_eval(det)
    h, w = val["hw"]
    rows = []
    with torch.no_grad():
        for i in range(len(val["images"])):
            img = torch.from_numpy(
                val["images"][i:i + 1].transpose(0, 3, 1, 2)).contiguous()
            cls, pts = det(img)
            metas = [dict(img_shape=(h, w, 3), pad_shape=(h, w, 3),
                          scale_factor=np.ones(4, np.float32))]
            res = det.bbox_head.get_bboxes(cls, pts, metas)
            boxes, labels = res[0]
            for b, l in zip(boxes.numpy(), labels.numpy()):
                cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
                rows.append(dict(image_id=i, category_id=int(l) + 1,
                                 point=[float(cx), float(cy)],
                                 score=float(b[4])))
    return _point_ap(_coco_gt(val), rows)


def eval_jax_point_ap(model, state, val):
    import jax
    import jax.numpy as jnp
    h, w = val["hw"]
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]

    @jax.jit
    def infer(img, img_shape):
        return model.apply(variables, img, img_shape,
                           method=model.simple_test)

    rows = []
    img_shape = jnp.asarray([[h, w]], jnp.int32)
    for i in range(len(val["images"])):
        dets, pts = infer(jnp.asarray(val["images"][i:i + 1]), img_shape)
        bxs = np.asarray(dets.bboxes[0])
        lbl = np.asarray(dets.labels[0])
        ok = np.asarray(dets.valid[0])
        pt = np.asarray(pts[0])
        for b, l, p in zip(bxs[ok], lbl[ok], pt[ok]):
            rows.append(dict(image_id=i, category_id=int(l) + 1,
                             point=[float(p[0]), float(p[1])],
                             score=float(b[4])))
    return _point_ap(_coco_gt(val), rows)


# ---------------------------------------------------------------------
# held-out AP with the SAME evaluator for both frameworks
# ---------------------------------------------------------------------

def _coco_gt(val, img_off: int = 0):
    h, w = val["hw"]
    images, anns = [], []
    aid = 1
    for i, g in enumerate(val["gts"]):
        images.append(dict(id=img_off + i, width=w, height=h,
                           file_name=f"synth_{i}.jpg"))
        for b in g:
            x1, y1, x2, y2 = [float(v) for v in b]
            anns.append(dict(id=aid, image_id=img_off + i, category_id=1,
                             bbox=[x1, y1, x2 - x1, y2 - y1],
                             area=(x2 - x1) * (y2 - y1), iscrowd=0))
            aid += 1
    return dict(images=images, annotations=anns,
                categories=[dict(id=1, name="person")])


def _ap(gt_dict, det_rows):
    from pointtinybenchmark_tpu.data.coco import COCO
    from pointtinybenchmark_tpu.evaluation.cocoeval import COCOExpandEval
    coco = COCO(gt_dict)
    ev = COCOExpandEval(coco, coco.loadRes(det_rows), "bbox",
                        cocofmt_param=dict(evaluate_standard="tiny"))
    ev.evaluate()
    ev.accumulate()
    return ev.summarize()


def eval_torch_ap(det, val):
    import torch
    det.eval()
    set_norm_eval(det)
    h, w = val["hw"]
    rows = []
    with torch.no_grad():
        for i in range(len(val["images"])):
            img = torch.from_numpy(
                val["images"][i:i + 1].transpose(0, 3, 1, 2)).contiguous()
            outs = det(img)
            metas = [dict(img_shape=(h, w, 3), pad_shape=(h, w, 3),
                          scale_factor=np.ones(4, np.float32))]
            res = det.bbox_head.get_bboxes(*outs, metas, rescale=False)
            boxes, labels = res[0]
            for b, l in zip(boxes.numpy(), labels.numpy()):
                rows.append(dict(image_id=i, category_id=int(l) + 1,
                                 bbox=[float(b[0]), float(b[1]),
                                       float(b[2] - b[0]),
                                       float(b[3] - b[1])],
                                 score=float(b[4])))
    return _ap(_coco_gt(val), rows)


def eval_jax_ap(model, state, val):
    import jax
    import jax.numpy as jnp
    h, w = val["hw"]
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]

    @jax.jit
    def infer(img, img_shape):
        return model.apply(variables, img, img_shape,
                           method=model.simple_test)

    rows = []
    n = len(val["images"])
    img_shape = jnp.asarray([[h, w]], jnp.int32)
    for i in range(n):
        dets, _ = infer(jnp.asarray(val["images"][i:i + 1]), img_shape)
        bxs = np.asarray(dets.bboxes[0])
        lbl = np.asarray(dets.labels[0])
        ok = np.asarray(dets.valid[0])
        for b, l in zip(bxs[ok], lbl[ok]):
            rows.append(dict(image_id=i, category_id=int(l) + 1,
                             bbox=[float(b[0]), float(b[1]),
                                   float(b[2] - b[0]), float(b[3] - b[1])],
                             score=float(b[4])))
    return _ap(_coco_gt(val), rows)


# ---------------------------------------------------------------------
# experiment driver
# ---------------------------------------------------------------------

def run_retina_experiment(steps: int = 300, batch_size: int = 2,
                          n_train: int = 64, n_val: int = 16,
                          hw=(256, 320), seed: int = 0,
                          log_every: int = 0):
    """Train both stacks from identical init; returns trajectories + APs."""
    import torch
    torch.set_num_threads(max(1, os.cpu_count() or 1))

    train = make_tiny_dataset(n_train, hw=hw, seed=seed)
    val = make_tiny_dataset(n_val, hw=hw, seed=seed + 1000)
    order = batch_order(n_train, batch_size, steps)
    step_iters = [int(steps * 2 / 3), int(steps * 5 / 6)]

    det = make_torch_retina(seed=seed)
    params, stats = torch_state_to_jax(det)
    model = make_jax_retina()

    t_losses = train_torch(det, train, order, step_iters,
                           log_every=log_every)
    j_losses, state = train_jax(model, params, stats, train, order,
                                step_iters, log_every=log_every)

    ap_t = eval_torch_ap(det, val)
    ap_j = eval_jax_ap(model, state, val)
    return dict(torch_losses=t_losses, jax_losses=j_losses,
                ap_torch=ap_t, ap_jax=ap_j, step_iters=step_iters)


def trajectory_stats(t_losses: np.ndarray, j_losses: np.ndarray,
                     smooth: int = 10):
    """Comparison metrics: first-step rel diff (init parity), mean rel diff
    of `smooth`-step moving means, final-window rel diff."""
    def smooth_curve(x):
        k = min(smooth, len(x))
        return np.convolve(x, np.ones(k) / k, mode="valid")

    st, sj = smooth_curve(t_losses), smooth_curve(j_losses)
    rel = np.abs(st - sj) / np.maximum(np.abs(st), 1e-8)
    last = slice(max(len(st) - smooth, 0), None)
    return dict(
        first_step_rel=float(abs(t_losses[0] - j_losses[0])
                             / max(abs(t_losses[0]), 1e-8)),
        mean_rel=float(rel.mean()),
        max_rel=float(rel.max()),
        final_rel=float(np.abs(st[last].mean() - sj[last].mean())
                        / max(abs(st[last].mean()), 1e-8)),
    )
