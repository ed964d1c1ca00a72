"""Scaling-shape evidence on the 8-device virtual CPU mesh + real-chip
mesh(1) overhead. Results go into BASELINE.md (BASELINE.json asks for a
scaling-efficiency story; only one physical chip exists, so this measures
(a) sharding overhead at D=1 and (b) walltime shape D=1..8 on virtual CPU
devices, where collective STRUCTURE is real but bandwidth is host RAM)."""
import os, sys, time

mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
if mode == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from zkarray.jaxcache import setup_cache

jax = setup_cache()
if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from zkarray.curves import bn254
from zkarray.dist import fft_sharded, make_mesh, msm_sharded
from zkarray.ec.sw import AffinePoints
from zkarray.ff import fp
from zkarray.poly.domain import Radix2Domain
from ec_oracle import ec_mul

print("backend:", jax.default_backend(), "devices:", len(jax.devices()), flush=True)


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:2])


def timeit(fn, iters=3):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


curve = bn254.G1
rng = np.random.default_rng(0)
log_n = 12
n = 1 << log_n
g = (curve.gen_x, curve.gen_y)
base = [ec_mul(g, int(k), curve.a_int, curve.base.modulus)
        for k in rng.integers(1, 1 << 30, size=32)]
A0 = curve.affine_from_ints(base)
reps = n // 32
px = jnp.asarray(np.tile(np.asarray(A0.x), (1, reps)))
py = jnp.asarray(np.tile(np.asarray(A0.y), (1, reps)))
pinf = jnp.zeros(n, dtype=bool)
A = AffinePoints(px, py, pinf)
Ls = curve.scalar.num_limbs
sc = rng.integers(0, 1 << 16, size=(Ls, n), dtype=np.uint32)
sc[4:] = 0  # 64-bit scalars match max_scalar_bits=64 (small, fast compiles)
s = jnp.asarray(sc)

# unsharded reference
t_un = timeit(lambda: __import__("zkarray.ec.msm", fromlist=["msm"]).msm(
    curve, A, s, 8, 64))
print(f"msm 2^{log_n} unsharded: {t_un*1e3:.0f} ms", flush=True)

sizes = [1, 8] if mode == "cpu" else [1]
for D in sizes:
    mesh = make_mesh(D)
    t = timeit(lambda: msm_sharded(curve, A, s, mesh, c=8, max_scalar_bits=64))
    print(f"msm 2^{log_n} sharded D={D}: {t*1e3:.0f} ms  (vs unsharded {t_un/t:.2f}x)",
          flush=True)

# NTT
spec = bn254.FR
log_m = 16
m = 1 << log_m
limbs = rng.integers(0, 1 << 16, size=(spec.num_limbs, m), dtype=np.uint32)
limbs[-1] >>= 3
a = jnp.asarray(limbs)
dom = Radix2Domain(spec, m)
t_un = timeit(lambda: dom.fft(a))
print(f"ntt 2^{log_m} unsharded: {t_un*1e3:.0f} ms", flush=True)
for D in sizes:
    mesh = make_mesh(D)
    t = timeit(lambda: fft_sharded(spec, a, mesh, dom.group_gen_int))
    print(f"ntt 2^{log_m} sharded D={D}: {t*1e3:.0f} ms  (vs unsharded {t_un/t:.2f}x)",
          flush=True)
print("done", flush=True)
