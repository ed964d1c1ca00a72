"""New aligned-rounds MSM on the real TPU: correctness (vs small oracle) + throughput."""
import os, sys, time

sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from zkarray.curves import bls12_381
from zkarray.ec import msm as msm_mod, sw
from zkarray.ec.sw import AffinePoints
from zkarray.ff import fp
from ec_oracle import ec_mul, ec_add

curve = bls12_381.G1
print("backend:", jax.default_backend())

def sync(x): return np.asarray(x)

# small correctness on TPU (n=2048 so pallas path engages)
rng = np.random.default_rng(0)
a_int, mod = curve.a_int, curve.base.modulus
gen = (curve.gen_x, curve.gen_y)
mults = [ec_mul(gen, int(k), a_int, mod) for k in range(1, 17)]
n0 = 2048
pts = [mults[i % 16] for i in range(n0)]
ks = [int(rng.integers(0, 1 << 62)) for _ in range(n0)]
A = curve.affine_from_ints(pts)
s = fp.from_ints(curve.scalar, ks, mont=False)
t0 = time.perf_counter()
res = msm_mod.msm_affine(curve, A, s, 8)
got = curve.affine_to_ints(res)[0]
print(f"small msm compile+run: {time.perf_counter()-t0:.1f}s")
# oracle: sum k_i * (i%16+1) mod r weights
r = curve.scalar.modulus
w = [0]*16
for i, k in enumerate(ks):
    w[i % 16] = (w[i % 16] + k) % r
exp = None
for j in range(16):
    exp = ec_add(exp, ec_mul(mults[j], w[j], a_int, mod), a_int, mod)
assert got == exp, "MSM WRONG vs oracle"
print("small msm on TPU: CORRECT")

# throughput at 2^16, 2^18, 2^20
for logn in (16, 18, 20):
    n = 1 << logn
    reps = n // 16
    px = np.tile(np.asarray(A.x)[:, :16], (1, reps))
    py = np.tile(np.asarray(A.y)[:, :16], (1, reps))
    pinf = np.zeros(n, dtype=bool)
    Ls = curve.scalar.num_limbs
    sc = rng.integers(0, 1 << 16, size=(Ls, n), dtype=np.uint32)
    sc[-1] >>= 2
    Ab = AffinePoints(jnp.asarray(px), jnp.asarray(py), jnp.asarray(pinf))
    sb = jnp.asarray(sc)
    t0 = time.perf_counter()
    out = msm_mod.msm(curve, Ab, sb)
    sync(out.x[:, 0] if out.x.ndim > 1 else out.x)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    iters = 2
    for _ in range(iters):
        out = msm_mod.msm(curve, Ab, sb)
    sync(out.zz)
    dt = (time.perf_counter() - t0) / iters
    print(f"MSM 2^{logn}: compile+first {tc:7.1f}s   run {dt*1e3:9.1f} ms  -> {n/dt/1e6:6.3f} M points/s")
