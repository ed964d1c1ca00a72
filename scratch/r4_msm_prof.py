"""Per-phase profile of the tile-kernel MSM at 2^18/c=13 on TPU."""
import os, sys, time

sys.path.insert(0, "/root/repo")
from zkarray.jaxcache import setup_cache

jax = setup_cache()
import functools
import jax.numpy as jnp
import numpy as np

from zkarray.curves import bls12_381
from zkarray.ec import msm as m, sw
from zkarray.ec.sw import AffinePoints
from zkarray.kernels import sw as ksw

curve = bls12_381.G1
f = curve.base
L = f.num_limbs
print("backend:", jax.default_backend(), "T=", m.ACCUM_T, flush=True)


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:2])


def bench(name, fn, *args, iters=3):
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s}: {dt*1e3:9.2f} ms   (compile+1st {tc:.1f}s)", flush=True)
    return out


rng = np.random.default_rng(0)
log_n = 18
n = 1 << log_n
c = 13
bits = 254
W, half, splits, _ = m._window_geometry(c, bits)
WB = W * half
nb = -(-WB // 1024)
WBp = nb * 1024
T = m.ACCUM_T
print(f"n=2^{log_n} c={c} W={W} half={half} nb={nb}", flush=True)

px = jnp.asarray(rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32))
py = jnp.asarray(rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32))
pinf = jnp.zeros(n, dtype=bool)
A = AffinePoints(px, py, pinf)
Ls = curve.scalar.num_limbs
sc = rng.integers(0, 1 << 16, size=(Ls, n), dtype=np.uint32)
sc[-1] >>= 2
s = jnp.asarray(sc)


# phase 1: digits + sort + searchsorted + packing
@jax.jit
def phase_sort(s, px, py, pinf):
    digits = m.signed_digits(curve.scalar, s, c, W)
    mag = jnp.abs(digits)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (W, n))
    for w, v_w, K_w in splits:
        row = mag[w]
        sub = (iota[0] % K_w) * v_w
        mag = mag.at[w].set(jnp.where(row > 0, row + sub, 0))
    payload = (
        iota | ((digits < 0).astype(jnp.int32) << 30)
        | (pinf[None, :].astype(jnp.int32) << 29)
    )
    keys, packed = jax.lax.sort_key_val(mag, payload, dimension=1)
    S = m._searchsorted_batch(keys, half + 1)
    pxy = jnp.concatenate([px, py], axis=0)
    pxy = pxy[0::2] | (pxy[1::2] << 16)
    return packed, pxy, S


packed, pxy, S = bench("digits+sort+search+pack", phase_sort, s, px, py, pinf)
counts = np.asarray(S[:, 1:] - S[:, :-1])
rounds = int(counts.max())
n_tiles = -(-rounds // T)
print(f"rounds={rounds} tiles={n_tiles}", flush=True)

S_lo = jnp.pad(jnp.asarray(S[:, :-1]).reshape(WB), (0, WBp - WB))
S_hi = jnp.pad(jnp.asarray(S[:, 1:]).reshape(WB), (0, WBp - WB))
base = jnp.pad(
    np.broadcast_to(np.arange(W, dtype=np.int32)[:, None] * n, (W, half)).reshape(WB),
    (0, WBp - WB),
)
packed_flat = packed.reshape(W * n)
rT = jnp.arange(T, dtype=jnp.int32)


# phase 2: one tile's index+coordinate gathers (no kernel)
@jax.jit
def phase_gathers(packed_flat, pxy, t0v):
    pos = S_lo[None, :] + (t0v + rT)[:, None]
    valid = pos < S_hi[None, :]
    posc = jnp.where(valid, pos, 0)
    pk = jnp.take(packed_flat, (base[None] + posc).reshape(-1))
    pk = jnp.where(valid, pk.reshape(T, WBp), jnp.int32(1 << 29))
    cidx = (pk & ((1 << 29) - 1)).reshape(-1)
    g = pxy[:, cidx]
    coords = (
        g.reshape(L, T, nb, 8, 128).transpose(2, 1, 0, 3, 4).reshape(nb, T * L, 8, 128)
    )
    pkr = pk.reshape(T, nb, 8, 128).transpose(1, 0, 2, 3)
    return coords, pkr


coords, pkr = bench("one tile: gathers+transposes", phase_gathers, packed_flat, pxy, jnp.int32(0))


# phase 3: the accumulation kernel alone, one tile
state0 = sw.xyzz_zero(curve, (W, half))
rows = jnp.concatenate(
    [m._pack_pairs(v.reshape(L, WB)) for v in state0], axis=0
)
rows = jnp.pad(rows, ((0, 0), (0, WBp - WB)))
state_p = rows.reshape(2 * L, nb, 8, 128).transpose(1, 0, 2, 3)


@jax.jit
def phase_kernel(state_p, coords, pkr):
    return ksw.xyzz_accum_tiles(curve, state_p, coords, pkr, T)


bench("one tile: accum kernel (T=16)", phase_kernel, state_p, coords, pkr)


# phase 4: full accumulate + reduce for comparison
@jax.jit
def full_acc(A_x, A_y, A_inf, s, st):
    return m.msm_accumulate(curve, AffinePoints(A_x, A_y, A_inf), s, c, bits, st)


st = bench("msm_accumulate (all tiles)", full_acc, px, py, pinf, s, state0)


@jax.jit
def full_red(st):
    return m.msm_reduce(curve, st, c, bits)


bench("msm_reduce", full_red, st)
print("done", flush=True)
