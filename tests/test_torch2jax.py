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
