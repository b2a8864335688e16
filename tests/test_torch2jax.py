"""torch->flax ResNet weight converter: golden forward parity vs torch."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import os.path as osp  # noqa: E402
import sys  # noqa: E402

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools",
                            "model_converters"))
from torch2jax import convert_resnet_state_dict  # noqa: E402


class _BasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU()
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idn)


class _TorchResNet18(tnn.Module):
    def __init__(self, base=8):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, base, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(base)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        chans = [base, base * 2, base * 4, base * 8]
        cin = base
        for li, c in enumerate(chans):
            stride = 1 if li == 0 else 2
            blocks = [_BasicBlock(cin, c, stride), _BasicBlock(c, c, 1)]
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))
            cin = c

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
            outs.append(x)
        return outs


def test_resnet18_forward_parity():
    tm = _TorchResNet18(base=8).eval()
    # randomize BN stats so the test catches mean/var mix-ups
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_resnet_state_dict(sd, depth=18)

    from pointtinybenchmark_tpu.models import ResNet
    fm = ResNet(depth=18, base_channels=8)
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    outs = fm.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x))
    assert len(outs) == 4
    for o, r in zip(outs, ref):
        got = np.asarray(o)
        want = r.detach().numpy().transpose(0, 2, 3, 1)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_bottleneck_shapes_convert():
    """ResNet-50-style (bottleneck) state dict maps without key errors and
    matches our init structure."""
    from pointtinybenchmark_tpu.models import ResNet
    fm = ResNet(depth=50, base_channels=8)
    v = fm.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))

    # fabricate a torch-style sd from the flax tree's shapes (inverse map)
    sd = {}

    def emit_conv(src, kern):
        sd[f"{src}.weight"] = np.transpose(np.asarray(kern), (3, 2, 0, 1))

    def emit_bn(src, scope_p, scope_s):
        sd[f"{src}.weight"] = np.asarray(scope_p["scale"])
        sd[f"{src}.bias"] = np.asarray(scope_p["bias"])
        sd[f"{src}.running_mean"] = np.asarray(scope_s["mean"])
        sd[f"{src}.running_var"] = np.asarray(scope_s["var"])

    p, st = v["params"], v["batch_stats"]
    emit_conv("conv1", p["Conv_0"]["kernel"])
    emit_bn("bn1", p["BatchNorm_0"], st["BatchNorm_0"])
    for name in p:
        if not name.startswith("layer"):
            continue
        li, bi = name.replace("layer", "").split("_block")
        n_convs = sum(1 for k in p[name] if k.startswith("Conv"))
        for k in range(min(n_convs, 3)):
            emit_conv(f"layer{li}.{bi}.conv{k + 1}",
                      p[name][f"Conv_{k}"]["kernel"])
            emit_bn(f"layer{li}.{bi}.bn{k + 1}",
                    p[name][f"BatchNorm_{k}"], st[name][f"BatchNorm_{k}"])
        if n_convs == 4:
            emit_conv(f"layer{li}.{bi}.downsample.0",
                      p[name]["Conv_3"]["kernel"])
            emit_bn(f"layer{li}.{bi}.downsample.1",
                    p[name]["BatchNorm_3"], st[name]["BatchNorm_3"])
    params, stats = convert_resnet_state_dict(sd, depth=50)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(v["params"])
    assert len(flat_a) == len(flat_b)
    # structural equality: applying converted params works
    outs = fm.apply({"params": params, "batch_stats": stats},
                    jnp.ones((1, 32, 32, 3)))
    assert len(outs) == 4


def test_full_detector_converter_structural_and_fc_permute():
    """convert_detector_state_dict: full mmdet Faster R-CNN / RetinaNet
    state_dicts map onto our detector trees with matching shapes, and the
    first shared fc's CHW->HWC input permutation is numerically exact."""
    from torch2jax import convert_detector_state_dict

    # --- numeric: torch Linear on (C,7,7)-flatten == our Dense on
    # (7,7,C)-flatten with the converted kernel
    rng = np.random.RandomState(0)
    C, O, R = 8, 16, 3
    lin = tnn.Linear(C * 49, O)
    feats_t = torch.tensor(rng.rand(R, C, 7, 7).astype(np.float32))
    with torch.no_grad():
        ref = lin(feats_t.reshape(R, -1)).numpy()
    sd = {"roi_head.bbox_head.shared_fcs.0.weight": lin.weight.detach().numpy(),
          "roi_head.bbox_head.shared_fcs.0.bias": lin.bias.detach().numpy()}
    params, _, unmapped = convert_detector_state_dict(sd, depth=18)
    assert not unmapped
    w = params["roi_head_m"]["bbox_head_m"]["shared_fc0"]["kernel"]
    b = params["roi_head_m"]["bbox_head_m"]["shared_fc0"]["bias"]
    feats_j = np.transpose(feats_t.numpy(), (0, 2, 3, 1)).reshape(R, -1)
    np.testing.assert_allclose(feats_j @ w + b, ref, atol=1e-5)

    # --- structural: synthetic mmdet-style Faster R-CNN state_dict loads
    # into our init tree with identical shapes
    import jax
    from pointtinybenchmark_tpu.models import build_detector

    def conv_sd(prefix, cin, cout, k, bias=True):
        d = {f"{prefix}.weight": rng.rand(cout, cin, k, k).astype(np.float32)}
        if bias:
            d[f"{prefix}.bias"] = rng.rand(cout).astype(np.float32)
        return d

    sd = {}
    for i in range(4):
        cin = [8, 16, 32, 64][i]
        sd.update(conv_sd(f"neck.lateral_convs.{i}.conv", cin, 8, 1))
        sd.update(conv_sd(f"neck.fpn_convs.{i}.conv", 8, 8, 3))
    sd.update(conv_sd("rpn_head.rpn_conv", 8, 8, 3))
    sd.update(conv_sd("rpn_head.rpn_cls", 8, 1, 1))
    sd.update(conv_sd("rpn_head.rpn_reg", 8, 4, 1))
    sd["roi_head.bbox_head.shared_fcs.0.weight"] = \
        rng.rand(16, 8 * 49).astype(np.float32)
    sd["roi_head.bbox_head.shared_fcs.0.bias"] = \
        rng.rand(16).astype(np.float32)
    sd["roi_head.bbox_head.shared_fcs.1.weight"] = \
        rng.rand(16, 16).astype(np.float32)
    sd["roi_head.bbox_head.shared_fcs.1.bias"] = \
        rng.rand(16).astype(np.float32)
    sd["roi_head.bbox_head.fc_cls.weight"] = rng.rand(2, 16).astype(np.float32)
    sd["roi_head.bbox_head.fc_cls.bias"] = rng.rand(2).astype(np.float32)
    sd["roi_head.bbox_head.fc_reg.weight"] = rng.rand(4, 16).astype(np.float32)
    sd["roi_head.bbox_head.fc_reg.bias"] = rng.rand(4).astype(np.float32)
    params, stats, unmapped = convert_detector_state_dict(sd, depth=18)
    assert not unmapped

    m = build_detector(
        dict(type="FasterRCNN",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=8, num_outs=5),
             rpn_head=dict(
                 type="RPNHead", num_classes=1, in_channels=8,
                 feat_channels=8,
                 anchor_generator=dict(type="AnchorGenerator", scales=[2],
                                       ratios=[1.0],
                                       strides=[4, 8, 16, 32, 64]),
                 bbox_coder=dict(target_means=[0, 0, 0, 0],
                                 target_stds=[1, 1, 1, 1]),
                 loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True),
                 loss_bbox=dict(type="L1Loss")),
             roi_head=dict(
                 type="StandardRoIHead",
                 bbox_roi_extractor=dict(
                     roi_layer=dict(type="RoIAlign", output_size=7,
                                    sampling_ratio=1),
                     out_channels=8, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(type="Shared2FCBBoxHead", num_classes=1,
                                in_channels=8, fc_out_channels=16,
                                roi_feat_size=7))),
        None,
        dict(rpn=dict(nms_pre=32, max_per_img=8,
                      nms=dict(iou_threshold=0.7), min_bbox_size=0),
             rcnn=dict(score_thr=0.1, nms=dict(iou_threshold=0.5),
                       max_per_img=5)))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
               train=False)

    def shapes(d, pre=""):
        out = {}
        for k, x in d.items():
            if isinstance(x, dict):
                out.update(shapes(x, pre + k + "/"))
            else:
                out[pre + k] = tuple(x.shape)
        return out

    ref_shapes = shapes(v["params"])
    got_shapes = shapes(params)
    # everything we converted (no backbone keys in sd) must exist in the
    # model tree with the same shape
    for k, shp in got_shapes.items():
        assert k in ref_shapes, f"converted key {k} not in model tree"
        assert ref_shapes[k] == shp, (k, ref_shapes[k], shp)
    # and the neck/heads are fully covered
    covered = {k for k in ref_shapes if not k.startswith("backbone_m/")}
    assert covered == set(got_shapes), covered ^ set(got_shapes)
