"""FPG and NASFCOS-FPN necks."""
import numpy as np

import jax
import jax.numpy as jnp

from pointtinybenchmark_tpu.models import FPG, NASFCOS_FPN


def _feats(chans=(8, 16, 32, 64), base=32):
    rng = np.random.RandomState(0)
    return [jnp.asarray(rng.rand(2, base // (2 ** i), base // (2 ** i), c),
                        jnp.float32) for i, c in enumerate(chans)]


def test_fpg_shapes_and_grad():
    neck = FPG(in_channels=(8, 16, 32, 64), out_channels=16, num_outs=5,
               stack_times=3, inter_channels=16,
               skip_inds=[[0], [0, 1], [], [0], []])
    feats = _feats()
    params = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(params, feats)
    assert len(outs) == 5
    assert [o.shape[-1] for o in outs] == [16] * 5
    assert outs[0].shape[1] == 32 and outs[4].shape[1] == 2

    def loss(p):
        return sum(jnp.sum(o ** 2) for o in neck.apply(p, feats))
    g = jax.grad(loss)(params)
    gn = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.sum(x * x)),
                                   g["params"], 0.0)
    assert np.isfinite(gn) and gn > 0


def test_nasfcos_fpn_shapes():
    neck = NASFCOS_FPN(in_channels=(16, 32, 64), out_channels=16, num_outs=5)
    feats = _feats()[1:]
    params = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(params, feats)
    assert len(outs) == 5
    assert [o.shape[-1] for o in outs] == [16] * 5
    # P3 keeps the finest input resolution
    assert outs[0].shape[1:3] == feats[0].shape[1:3]
