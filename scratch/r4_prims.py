"""Round-4 primitive measurements on the real TPU: gather layouts at MSM
scale, per-round dispatch overhead, kernel rates. Decides the MSM redesign."""
import os, sys, time

sys.path.insert(0, "/root/repo")
from zkarray.jaxcache import setup_cache

jax = setup_cache()
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), jax.devices(), flush=True)


def sync(x):
    return np.asarray(x)


def timeit(f, *args, iters=3):
    out = f(*args)
    sync(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    sync(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    return (time.perf_counter() - t0) / iters


rng = np.random.default_rng(0)
N = 1 << 20
L = 24  # packed x||y rows for BLS12-381 Fq (2 limbs per u32 word)
W, half = 21, 4096
M1 = W * half            # one round of indices: 86k
T = 24
MT = T * M1              # a 24-round tile: 2.1M

tbl_ax1 = jnp.asarray(rng.integers(0, 1 << 32, size=(L, N), dtype=np.uint32))
tbl_row = jnp.asarray(np.ascontiguousarray(np.asarray(tbl_ax1).T))  # (N, L)
idx_small = jnp.asarray(rng.integers(0, N, size=(M1,), dtype=np.int32))
idx_big = jnp.asarray(rng.integers(0, N, size=(MT,), dtype=np.int32))

# 1. axis-1 (minor-dim) gather, one-round size vs tile size
@jax.jit
def g_ax1_small(t, i):
    return t[:, i]

@jax.jit
def g_ax1_big(t, i):
    return t[:, i]

t = timeit(g_ax1_small, tbl_ax1, idx_small)
print(f"ax1 gather (L={L},N=2^20) x {M1} idx: {t*1e3:8.2f} ms  {M1*L*4/t/1e9:7.2f} GB/s")
t = timeit(g_ax1_big, tbl_ax1, idx_big)
print(f"ax1 gather (L={L},N=2^20) x {MT} idx: {t*1e3:8.2f} ms  {MT*L*4/t/1e9:7.2f} GB/s")

# 2. row-major gather
@jax.jit
def g_row(t, i):
    return jnp.take(t, i, axis=0)

t = timeit(g_row, tbl_row, idx_small)
print(f"row gather (N,{L}) x {M1} idx:        {t*1e3:8.2f} ms  {M1*L*4/t/1e9:7.2f} GB/s")
t = timeit(g_row, tbl_row, idx_big)
print(f"row gather (N,{L}) x {MT} idx:        {t*1e3:8.2f} ms  {MT*L*4/t/1e9:7.2f} GB/s")

# 2b. row gather with monotone-ish indices (padded-expansion pattern)
idx_mono = jnp.sort(idx_big)
t = timeit(g_row, tbl_row, idx_mono)
print(f"row gather (N,{L}) x {MT} MONOTONE:   {t*1e3:8.2f} ms  {MT*L*4/t/1e9:7.2f} GB/s")

# 3. i32 expansion gather: take_along_axis (W, N) by (W, half*T)
src_wn = jnp.asarray(rng.integers(0, 1 << 30, size=(W, N), dtype=np.int32))
idx_taa = jnp.asarray(rng.integers(0, N, size=(W, half * T), dtype=np.int32))

@jax.jit
def g_taa(s, i):
    return jnp.take_along_axis(s, i, axis=1)

t = timeit(g_taa, src_wn, idx_taa)
nel = W * half * T
print(f"taa (W,N) x {nel} idx:                {t*1e3:8.2f} ms  {nel*4/t/1e9:7.2f} GB/s")

# 4. contiguous copy bandwidth
big = jnp.asarray(rng.integers(0, 1 << 32, size=(64 << 20,), dtype=np.uint32))  # 256MB

@jax.jit
def cpy(x):
    return x + np.uint32(1)

t = timeit(cpy, big)
print(f"contig read+write 256MB:              {t*1e3:8.2f} ms  {2*big.size*4/t/1e9:7.2f} GB/s")

# 5. per-round overhead WITHOUT gathers: 100 rounds of fused add on fixed slices
from zkarray.curves import bls12_381
from zkarray.ec import sw
from zkarray.ec.sw import AffinePoints, XYZZPoints
from zkarray.kernels import sw as ksw

curve = bls12_381.G1
Lq = curve.base.num_limbs
st0 = sw.xyzz_zero(curve, (W, half))
ax = jnp.asarray(rng.integers(0, 1 << 16, size=(Lq, W, half), dtype=np.uint32))
ay = jnp.asarray(rng.integers(0, 1 << 16, size=(Lq, W, half), dtype=np.uint32))
ainf = jnp.zeros((W, half), dtype=bool)
A = AffinePoints(ax, ay, ainf)
R = 50

@jax.jit
def loop_adds(st_x, st_y, st_zz, st_zzz, ax, ay, ainf):
    def body(i, st):
        return ksw.xyzz_add_affine(curve, st, AffinePoints(ax, ay, ainf))
    st = XYZZPoints(st_x, st_y, st_zz, st_zzz)
    st = jax.lax.fori_loop(0, R, body, st)
    return st.x

t = timeit(loop_adds, st0.x, st0.y, st0.zz, st0.zzz, ax, ay, ainf)
adds = R * W * half
mulps = adds * 14 / t
print(f"{R} rounds fused add (no gather):     {t*1e3:8.2f} ms  {t/R*1e3:6.2f} ms/round  {mulps/1e6:.0f} Mmul/s(mixed-add=14)")

# 6. sort baseline
mag = jnp.asarray(rng.integers(0, half + 1, size=(W, N), dtype=np.int32))

@jax.jit
def dosort(m):
    i = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (W, N))
    k, v = jax.lax.sort_key_val(m, i, dimension=1)
    return v

t = timeit(dosort, mag)
print(f"sort_key_val (W={W}, N=2^20):         {t*1e3:8.2f} ms")

# 7. scatter: N values into B*R padded slots (unique monotone dests)
BR = int(N * 14 // 10)
dest = jnp.sort(jnp.asarray(rng.choice(BR, size=N, replace=False).astype(np.int32)))
vals = jnp.asarray(rng.integers(0, 1 << 32, size=(L, N), dtype=np.uint32))

@jax.jit
def scat(d, v):
    out = jnp.zeros((L, BR), dtype=np.uint32)
    return out.at[:, d].set(v, mode="drop", unique_indices=True)

t = timeit(scat, dest, vals)
print(f"scatter (L,{N})->(L,{BR}):            {t*1e3:8.2f} ms  {N*L*4/t/1e9:7.2f} GB/s")
print("done", flush=True)
