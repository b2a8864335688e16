import time, numpy as np, jax, jax.numpy as jnp
import jax.lax as lax

B, C = 8, 256
shapes = [(128,160),(64,80),(32,40),(16,20)]
strides = (4,8,16,32)
R, out, sr = 4096, 7, 2
S = out*sr
rng = np.random.RandomState(0)
# build REAL roi-align index pattern on host (mirror of roi_align_multilevel)
bi = rng.randint(0,B,R).astype(np.int32)
cx = rng.uniform(10, 620, R); cy = rng.uniform(10, 500, R)
sz = rng.uniform(4, 40, R)
x1 = cx-sz/2; y1 = cy-sz/2; x2 = cx+sz/2; y2 = cy+sz/2
lv = np.clip(np.floor(np.log2(sz/56+1e-6)),0,3).astype(np.int32)
hs = np.array([s[0] for s in shapes]); ws = np.array([s[1] for s in shapes])
sizes = hs*ws
bases = np.cumsum([0]+[B*s for s in sizes])[:4]
scale = 1.0/np.array(strides)[lv]
h_r, w_r = hs[lv], ws[lv]
base_r = bases[lv] + bi*(h_r*w_r)
fx1 = x1*scale-0.5; fy1 = y1*scale-0.5
bw = (x2-x1)*scale/out; bh = (y2-y1)*scale/out
side = np.arange(S); frac = side//sr + ((side%sr)+0.5)/sr
sx = fx1[:,None] + frac[None,:]*bw[:,None]
sy = fy1[:,None] + frac[None,:]*bh[:,None]
xg = np.broadcast_to(sx[:,None,:],(R,S,S)); yg = np.broadcast_to(sy[:,:,None],(R,S,S))
wf = w_r[:,None,None].astype(np.float64); hf = h_r[:,None,None].astype(np.float64)
xc = np.clip(xg,0,wf-1); yc = np.clip(yg,0,hf-1)
x0 = np.floor(xc); y0 = np.floor(yc)
x1i = np.minimum(x0+1,wf-1).astype(np.int32); y1i = np.minimum(y0+1,hf-1).astype(np.int32)
x0i = x0.astype(np.int32); y0i = y0.astype(np.int32)
wx1 = xc-x0; wy1 = yc-y0
bb = base_r[:,None,None]; ww = w_r[:,None,None]
idx = np.stack([(bb+y0i*ww+x0i).reshape(-1),(bb+y0i*ww+x1i).reshape(-1),
                (bb+y1i*ww+x0i).reshape(-1),(bb+y1i*ww+x1i).reshape(-1)])
w4 = np.stack([((1-wy1)*(1-wx1)).reshape(-1),((1-wy1)*wx1).reshape(-1),
               (wy1*(1-wx1)).reshape(-1),(wy1*wx1).reshape(-1)])
M = int(bases[-1]+B*sizes[-1])
N = idx.shape[1]
print(f"M={M} N={N}")
idx = jnp.asarray(idx); w4 = jnp.asarray(w4, jnp.bfloat16)
gout = jnp.asarray(rng.randn(N, C), jnp.bfloat16)  # upstream grad per sample

def timeit(f, *a, n=20):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1000

@jax.jit
def v_four(idx, w4, gout):
    g = jnp.zeros((M, C), jnp.bfloat16)
    for t in range(4):
        g = g.at[idx[t]].add(gout * w4[t][:,None])
    return g

@jax.jit
def v_combined(idx, w4, gout):
    g = jnp.zeros((M, C), jnp.bfloat16)
    upd = (gout[None] * w4[:,:,None]).reshape(-1, C)
    return g.at[idx.reshape(-1)].add(upd)

@jax.jit
def v_f32(idx, w4, gout):
    g = jnp.zeros((M, C), jnp.float32)
    for t in range(4):
        g = g.at[idx[t]].add((gout * w4[t][:,None]).astype(jnp.float32))
    return g.astype(jnp.bfloat16)

@jax.jit
def v_sorted(idx, w4, gout):
    g = jnp.zeros((M, C), jnp.bfloat16)
    flat_idx = idx.reshape(-1)
    order = jnp.argsort(flat_idx)
    si = flat_idx[order]
    upd = (gout[None] * w4[:,:,None]).reshape(-1, C)[order]
    return g.at[si].add(upd, indices_are_sorted=True)

@jax.jit
def v_sorted_f32(idx, w4, gout):
    g = jnp.zeros((M, C), jnp.float32)
    flat_idx = idx.reshape(-1)
    order = jnp.argsort(flat_idx)
    si = flat_idx[order]
    upd = (gout[None] * w4[:,:,None]).reshape(-1, C)[order].astype(jnp.float32)
    return g.at[si].add(upd, indices_are_sorted=True).astype(jnp.bfloat16)

ref = None
for name, f in [("four_tap(cur)", v_four), ("combined", v_combined),
                ("f32", v_f32), ("sorted", v_sorted), ("sorted_f32", v_sorted_f32)]:
    t = timeit(f, idx, w4, gout)
    r = f(idx, w4, gout)
    s = float(r.astype(jnp.float32).sum())
    print(f"{name:16s} {t:8.2f} ms   checksum {s:.1f}")
