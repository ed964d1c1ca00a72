"""New tile-kernel MSM on the real TPU: verify vs XLA path, then time."""
import os, sys, time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from zkarray.jaxcache import setup_cache

jax = setup_cache()
import jax.numpy as jnp
import numpy as np

from zkarray.curves import bls12_381
from zkarray.ec import msm as m, sw
from zkarray.ec.sw import AffinePoints
from ec_oracle import ec_mul

print("backend:", jax.default_backend(), "T=", m.ACCUM_T, flush=True)
curve = bls12_381.G1


def sync(x):
    return np.asarray(x)


def make_inputs(log_n, seed=0):
    rng = np.random.default_rng(seed)
    n = 1 << log_n
    base_n = 64
    g = (curve.gen_x, curve.gen_y)
    ks = rng.integers(1, 1 << 30, size=base_n)
    base_pts = [ec_mul(g, int(k), curve.a_int, curve.base.modulus) for k in ks]
    A0 = curve.affine_from_ints(base_pts)
    reps = n // base_n
    px = np.tile(np.asarray(A0.x), (1, reps))
    py = np.tile(np.asarray(A0.y), (1, reps))
    Ls = curve.scalar.num_limbs
    sc = rng.integers(0, 1 << 16, size=(Ls, n), dtype=np.uint32)
    sc[-1] >>= 2
    A = AffinePoints(jnp.asarray(px), jnp.asarray(py), jnp.asarray(np.zeros(n, bool)))
    return A, jnp.asarray(sc), 16 * Ls - 2, ks, sc


def to_ints(out):
    ax = sw.xyzz_to_affine(
        curve, sw.XYZZPoints(*(v.reshape(v.shape + (1,)) for v in out))
    )
    return curve.affine_to_ints(ax)


# 1. verify at 2^16: kernel path vs host oracle (tiled structure:
#    expected = sum_k (sum_{i = k mod 64} s_i) * P_k, computed on host ints)
A, s, bits, ks, sc_np = make_inputs(16)
t0 = time.perf_counter()
out = m.msm(curve, A, s, None, bits)
got = to_ints(out)
print(f"2^16 kernel-path run+compile: {time.perf_counter()-t0:.1f}s", flush=True)

r_mod = curve.scalar.modulus
sc_int = np.zeros(s.shape[1], dtype=object)
vals = [int(x) for x in np.asarray(sc_np[0], dtype=np.int64)]
sc_ints = []
Ls = curve.scalar.num_limbs
for i in range(s.shape[1]):
    v = 0
    for l in range(Ls):
        v |= int(sc_np[l, i]) << (16 * l)
    sc_ints.append(v)
agg = [0] * 64
for i, v in enumerate(sc_ints):
    agg[i % 64] = (agg[i % 64] + v) % r_mod
g = (curve.gen_x, curve.gen_y)
exp = None
from ec_oracle import ec_add

for k, a in zip(ks, agg):
    pt = ec_mul(g, (int(k) * a) % r_mod, curve.a_int, curve.base.modulus)
    exp = ec_add(exp, pt, curve.a_int, curve.base.modulus)
print("oracle match:", got[0] == exp, flush=True)
assert got[0] == exp, (got, exp)

# 2. time 2^18 / 2^20
for log_n, cs in ((18, (13,)), (20, (13, 14))):
    A, s, bits, _, _ = make_inputs(log_n)
    for c in cs:
        t0 = time.perf_counter()
        out = m.msm(curve, A, s, c, bits)
        sync(out.zz)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            out = m.msm(curve, A, s, c, bits)
        sync(out.zz)
        dt = (time.perf_counter() - t0) / iters
        n = 1 << log_n
        print(
            f"msm 2^{log_n} c={c}: compile+1st {tc:.1f}s, {dt*1e3:.0f} ms, "
            f"{n/dt/1e3:.0f}k pts/s",
            flush=True,
        )
print("done", flush=True)
