"""DeformConv2d op + ResNet dcn/ContextBlock plugins."""
import numpy as np

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.ops.dcn import DeformConv2d


def test_deform_conv_equals_plain_conv_at_init():
    """Zero-init offsets -> DeformConv == dense 3x3 conv with the same
    weight (the taps fall exactly on the kernel grid)."""
    m = DeformConv2d(8, kernel_size=3, stride=1)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 10, 12, 4), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 10, 12, 8)
    # manual: taps = im2col with zero padding; dense contraction
    w = np.asarray(v["params"]["weight"]["kernel"])   # (9*4, 8)
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = np.zeros((1, 10, 12, 9, 4), np.float32)
    for ky in range(3):
        for kx in range(3):
            cols[0, :, :, ky * 3 + kx] = xp[0, ky:ky + 10, kx:kx + 12]
    want = cols.reshape(1, 10, 12, 36) @ w
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4, rtol=1e-4)


def test_deform_conv_stride_and_modulated():
    m = DeformConv2d(6, kernel_size=3, stride=2, modulated=True)
    x = jnp.ones((2, 16, 16, 4))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 8, 8, 6)
    # modulation logits exist (3*k*k offset channels)
    assert v["params"]["offset_conv"]["kernel"].shape[-1] == 27


def test_resnet_dcn_and_gcb():
    from pointtinybenchmark_tpu.models import ResNet
    m = ResNet(depth=50, base_channels=8, dcn=dict(type="DCNv2"),
               stage_with_dcn=(False, True, True, True),
               plugins=[dict(cfg=dict(type="ContextBlock", ratio=0.25),
                             stages=(False, True, True, True))])
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    flat = [jax.tree_util.keystr(k) for k, _ in
            jax.tree_util.tree_leaves_with_path(v["params"])]
    assert any("dcn_conv2" in s for s in flat)
    assert any("gcb" in s for s in flat)
    assert not any("layer1" in s and "dcn" in s for s in flat)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [32, 64, 128, 256]

    def loss(p):
        return sum(jnp.sum(o ** 2) for o in m.apply(
            {**v, "params": p}, x))
    g = jax.grad(loss)(v["params"])
    gn = jax.tree_util.tree_reduce(lambda a, t: a + float(jnp.sum(t * t)),
                                   g, 0.0)
    assert np.isfinite(gn) and gn > 0
