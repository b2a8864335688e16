import time, numpy as np, jax, jax.numpy as jnp

M, C = 217600, 256
N = 802816
rng = np.random.RandomState(0)

def mk(pattern):
    if pattern == "uniform":
        i = rng.randint(0, M, (4, N)).astype(np.int32)
    else:  # clustered: 64 hot windows of 4k rows each
        centers = rng.randint(0, M-4096, 64)
        c = centers[rng.randint(0, 64, (4, N))]
        i = (c + rng.randint(0, 4096, (4, N))).astype(np.int32)
    return jnp.asarray(i)

w4 = jnp.asarray(rng.randn(4, N), jnp.bfloat16)
gout = jnp.asarray(rng.randn(N, C), jnp.bfloat16)

@jax.jit
def v_four(idx, w4, gout):
    g = jnp.zeros((M, C), jnp.bfloat16)
    for t in range(4):
        g = g.at[idx[t]].add(gout * w4[t][:,None])
    return g

hlo = v_four.lower(mk("uniform"), w4, gout).compile().as_text()
import re
print("scatter ops in compiled HLO:", len(re.findall(r"scatter", hlo)))
for line in hlo.splitlines():
    if "scatter" in line and "=" in line:
        print(line.strip()[:160])
        break

def timeit(f, *a, n=50):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1000

for pat in ("uniform", "clustered"):
    i = mk(pat)
    print(pat, round(timeit(v_four, i, w4, gout), 3), "ms")
