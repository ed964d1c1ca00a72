"""Round-5 scaling evidence: compute-dominated sizes on the 8-virtual-CPU
mesh (the round-4 toy table was dispatch-dominated and flat — this one uses
sizes where per-device compute dominates, so the walltime SHAPE is real
evidence for the collective-volume model in BASELINE.md).

Run: python scratch/r5_scaling.py   (forces CPU + 8 virtual devices)
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zkarray.jaxcache import setup_cache

setup_cache()

import jax

# sitecustomize pre-imports jax with the shell's platform baked into
# jax.config — the env assignment above is not enough (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from zkarray.curves import bn254
from zkarray.dist.msm import msm_sharded
from zkarray.dist.ntt import fft_sharded
from zkarray.ec import msm as msm_mod
from zkarray.ec.sw import AffinePoints
from zkarray.poly.domain import Radix2Domain


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(f, reps=1):
    r = f()
    sync(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    sync(r)
    return (time.perf_counter() - t0) / reps


def main():
    devs = jax.devices()
    print(f"devices: {len(devs)}")
    rng = np.random.default_rng(0)

    # ---- MSM 2^18 (bn254, 64-bit scalars: keeps CPU compile sane) ----
    curve = bn254.G1
    L = curve.base.num_limbs
    Ls = curve.scalar.num_limbs
    n = 1 << 18
    px = jnp.asarray(rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32))
    py = jnp.asarray(rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32))
    A = AffinePoints(px, py, jnp.zeros(n, dtype=bool))
    sc = np.zeros((Ls, n), dtype=np.uint32)
    sc[:4] = rng.integers(0, 1 << 16, size=(4, n), dtype=np.uint32)
    sc = jnp.asarray(sc)

    t = timeit(lambda: msm_mod.msm(curve, A, sc, 10, 64))
    print(f"msm 2^18 unsharded: {t:.2f} s")
    for D in (1, 2, 8):
        mesh = Mesh(np.array(devs[:D]), ("shards",))
        t = timeit(
            lambda: msm_sharded(curve, A, sc, mesh, 10, max_scalar_bits=64)
        )
        print(f"msm 2^18 sharded D={D}: {t:.2f} s", flush=True)

    # ---- NTT 2^22 (bls12-381 Fr) ----
    from zkarray.curves import bls12_381

    spec = bls12_381.FR
    n = 1 << 22
    a = rng.integers(0, 1 << 16, size=(spec.num_limbs, n), dtype=np.uint32)
    a[-1] >>= 2
    a = jnp.asarray(a)
    dom = Radix2Domain(spec, n)
    t = timeit(lambda: dom.fft(a))
    print(f"ntt 2^22 unsharded: {t:.2f} s")
    for D in (1, 2, 8):
        mesh = Mesh(np.array(devs[:D]), ("shards",))
        t = timeit(lambda: fft_sharded(spec, a, mesh, dom.group_gen_int))
        print(f"ntt 2^22 sharded D={D}: {t:.2f} s", flush=True)


if __name__ == "__main__":
    main()
