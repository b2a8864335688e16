import time
import numpy as np
import jax
import jax.numpy as jnp
from __graft_entry__ import _flagship

model = _flagship(tiny=False, dtype="bfloat16")


def sync(out):
    x = [t for t in jax.tree_util.tree_leaves(out) if hasattr(t, "ndim")][0]
    float(jnp.asarray(x, jnp.float32).ravel()[0])


for batch in (16, 32, 64):
    img = jnp.asarray(np.random.RandomState(0).rand(batch, 512, 640, 3),
                      jnp.float32)
    img_shape = jnp.tile(jnp.asarray([[512, 640]], jnp.int32), (batch, 1))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), img, train=False)

    @jax.jit
    def full(img, img_shape):
        return model.apply(variables, img, img_shape,
                           method=model.simple_test)

    sync(full(img, img_shape))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        out = full(img, img_shape)
    sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"bs={batch}: {dt*1e3:.2f} ms/batch = {batch/dt:.1f} img/s",
          flush=True)
