"""Split msm() into phase jits to find where the full-jit 44s goes (2^16)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from zkarray.curves import bls12_381
from zkarray.ec import msm as M, sw
from zkarray.ec.sw import AffinePoints, XYZZPoints
from zkarray.ff import fp
import math, functools

curve = bls12_381.G1
f = curve.base
L = f.num_limbs
rng = np.random.default_rng(0)
n = 1 << 16
c = M.default_window_size(n)
half = 1 << (c - 1)
sb = curve.scalar.bits
W = sb // c + 1 + (1 if sb % c else 0)
print(f"n=2^16 c={c} W={W} half={half}", flush=True)

px = jnp.asarray(rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32))
py = jnp.asarray(rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32))
pinf = jnp.zeros(n, dtype=bool)
Ls = curve.scalar.num_limbs
scn = rng.integers(0, 1 << 16, size=(Ls, n), dtype=np.uint32); scn[-1] >>= 2
s = jnp.asarray(scn)

def sync(x): return np.asarray(x)

@jax.jit
def phaseA(s, px, py, pinf):
    digits = M.signed_digits(curve.scalar, s, c, W)
    mag = jnp.abs(digits)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (W, n))
    keys, sidx = jax.lax.sort_key_val(mag, iota, dimension=1)
    ssign = jnp.take_along_axis(digits < 0, sidx, axis=1)
    S = M._searchsorted_batch(keys, half + 1)
    counts = S[:, 1:] - S[:, :-1]
    rounds = jnp.max(counts)
    state0 = sw.xyzz_zero(curve, (W, half))

    def cond(carry):
        return carry[0] < rounds

    def body(carry):
        r, state = carry
        pos = S[:, :-1] + r
        valid = pos < S[:, 1:]
        posc = jnp.where(valid, pos, 0)
        idx = jnp.take_along_axis(sidx, posc, axis=1)
        sg = jnp.take_along_axis(ssign, posc, axis=1)
        gx = px[:, idx]
        gy = py[:, idx]
        ginf = pinf[idx] | ~valid
        gy = fp.select(sg, fp.neg(f, gy), gy)
        state = sw.xyzz_add_affine(curve, state, AffinePoints(gx, gy, ginf))
        return r + jnp.int32(1), state

    rr, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state0))
    return rr, state

@jax.jit
def phaseB(state):
    s_chunk = 1 << (int(math.log2(half)) // 2) if half >= 4 else 1
    if half % s_chunk or s_chunk == 1:
        s_chunk = half
    win = M._weighted_bucket_sum(curve, state, s_chunk)

    def outer(w, tot):
        tot = jax.lax.fori_loop(0, c, lambda _, t: sw.xyzz_double(curve, t), tot)
        w_idx = W - 2 - w
        wp = XYZZPoints(*(jax.lax.dynamic_index_in_dim(v, w_idx, axis=1, keepdims=False) for v in win))
        return sw.xyzz_add(curve, tot, wp)

    top = XYZZPoints(*(v[:, W - 1] for v in win))
    return jax.lax.fori_loop(0, W - 1, outer, top)

t0 = time.perf_counter()
rr, state = phaseA(s, px, py, pinf)
sync(state.x[0, 0, :2]); print(f"A compile+run {time.perf_counter()-t0:.1f}s rounds={int(sync(rr))}", flush=True)
t0 = time.perf_counter()
for _ in range(3):
    rr, state = phaseA(s, px, py, pinf)
sync(state.x[0, 0, :2]); print(f"A run {(time.perf_counter()-t0)/3*1e3:.0f} ms", flush=True)

t0 = time.perf_counter()
out = phaseB(state)
sync(out.x[0, :2]); print(f"B compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(3):
    out = phaseB(state)
sync(out.x[0, :2]); print(f"B run {(time.perf_counter()-t0)/3*1e3:.0f} ms", flush=True)
