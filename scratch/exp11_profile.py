"""Profile each MSM phase separately on TPU at 2^16."""
import os, sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from zkarray.curves import bls12_381
from zkarray.ec import msm as msm_mod, sw
from zkarray.ec.sw import AffinePoints, XYZZPoints
from zkarray.ff import fp

curve = bls12_381.G1
f = curve.base
L = f.num_limbs
def sync(x): return np.asarray(x)

rng = np.random.default_rng(0)
logn = 16; n = 1 << logn
c = 11; half = 1 << (c-1)
sb = curve.scalar.bits
W = sb // c + 1 + (1 if sb % c else 0)
print(f"n=2^{logn} c={c} W={W} half={half}")

px = jnp.asarray(rng.integers(0, 1<<16, size=(L, n), dtype=np.uint32))
py = jnp.asarray(rng.integers(0, 1<<16, size=(L, n), dtype=np.uint32))
pinf = jnp.zeros(n, dtype=bool)
Ls = curve.scalar.num_limbs
sc = rng.integers(0, 1<<16, size=(Ls, n), dtype=np.uint32); sc[-1] >>= 2
s = jnp.asarray(sc)

def bench(name, fn, *args, iters=3):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    sync(leaf.ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    print(f"{name:30s}: {(time.perf_counter()-t0)/iters*1e3:10.2f} ms")
    return out

@jax.jit
def phase1(s):
    digits = msm_mod.signed_digits(curve.scalar, s, c, W)
    mag = jnp.abs(digits)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (W, n))
    keys, sidx = jax.lax.sort_key_val(mag, iota, dimension=1)
    ssign = jnp.take_along_axis(digits < 0, sidx, axis=1)
    S = msm_mod._searchsorted_batch(keys, half + 1)
    return sidx, ssign, S

sidx, ssign, S = bench("digits+sort+searchsorted", phase1, s)

state0 = sw.xyzz_zero(curve, (W, half))

@jax.jit
def one_round(state, r, sidx, ssign, S):
    pos = S[:, :-1] + r
    valid = pos < S[:, 1:]
    posc = jnp.where(valid, pos, 0)
    idx = jnp.take_along_axis(sidx, posc, axis=1)
    sg = jnp.take_along_axis(ssign, posc, axis=1)
    gx = px[:, idx]; gy = py[:, idx]
    ginf = pinf[idx] | ~valid
    gy = fp.select(sg, fp.neg(f, gy), gy)
    return sw.xyzz_add_affine(curve, state, AffinePoints(gx, gy, ginf))

state1 = bench("one round body (jitted)", one_round, state0, jnp.int32(0), sidx, ssign, S, iters=10)

# isolate the pallas add alone
gx = px[:, :W*half].reshape(L, W, half); gy = py[:, :W*half].reshape(L, W, half)
ginf = jnp.zeros((W, half), bool)
@jax.jit
def add_only(state, gx, gy, ginf):
    return sw.xyzz_add_affine(curve, state, AffinePoints(gx, gy, ginf))
bench("xyzz_add_affine pallas only", add_only, state0, gx, gy, ginf, iters=10)

@jax.jit
def gather_only(sidx, ssign, S, r):
    pos = S[:, :-1] + r
    valid = pos < S[:, 1:]
    posc = jnp.where(valid, pos, 0)
    idx = jnp.take_along_axis(sidx, posc, axis=1)
    sg = jnp.take_along_axis(ssign, posc, axis=1)
    gx = px[:, idx]; gy = py[:, idx]
    return gx, gy, sg
bench("gather only", gather_only, sidx, ssign, S, jnp.int32(0), iters=10)

@jax.jit
def wsum(state):
    s_chunk = 1 << (int(np.log2(half)) // 2)
    return msm_mod._weighted_bucket_sum(curve, state, s_chunk)
win = bench("weighted bucket sum", wsum, state1)

@jax.jit
def horner(win):
    import math
    def outer(w, tot):
        tot = jax.lax.fori_loop(0, c, lambda _, t: sw.xyzz_double(curve, t), tot)
        w_idx = W - 2 - w
        wp = XYZZPoints(*(jax.lax.dynamic_index_in_dim(v, w_idx, axis=1, keepdims=False) for v in win))
        return sw.xyzz_add(curve, tot, wp)
    top = XYZZPoints(*(v[:, W-1] for v in win))
    return jax.lax.fori_loop(0, W-1, outer, top)
bench("horner windows", horner, win)
