import time, numpy as np, jax, jax.numpy as jnp
from pointtinybenchmark_tpu.ops.roi_align import roi_align_multilevel

B, C = 8, 256
shapes = [(128,160),(64,80),(32,40),(16,20)]
strides = (4,8,16,32)
R = 4096
rng = np.random.RandomState(0)
feats = tuple(jnp.asarray(rng.randn(B,h,w,C), jnp.bfloat16) for h,w in shapes)
# tiny-person-like rois: small boxes mostly assigned to P2
bi = rng.randint(0,B,R).astype(np.float32)
cx = rng.uniform(10, 620, R); cy = rng.uniform(10, 500, R)
sz = rng.uniform(4, 40, R)
rois = jnp.asarray(np.stack([bi, cx-sz/2, cy-sz/2, cx+sz/2, cy+sz/2],1), jnp.float32)
scale = np.sqrt(sz*sz)
lvls = jnp.asarray(np.clip(np.floor(np.log2(scale/56+1e-6)),0,3).astype(np.int32))

def loss(feats):
    out = roi_align_multilevel(feats, rois, lvls, strides, 7, 2, True)
    return (out.astype(jnp.float32)**2).sum()

g = jax.jit(jax.grad(loss))
fwd = jax.jit(lambda f: roi_align_multilevel(f, rois, lvls, strides, 7, 2, True))

def timeit(f, *a, n=30):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1000

print("fwd     :", round(timeit(fwd, feats),3), "ms")
print("fwd+bwd :", round(timeit(g, feats),3), "ms")
