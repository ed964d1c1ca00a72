"""Benchmark harness — prints ONE JSON line for the driver.

North-star metric (BASELINE.json): BLS12-381 G1 MSM points/s/chip at
2^18-2^20, plus Fr NTT elems/s. ``vs_baseline`` compares against 1.0e6
points/s — the order of magnitude of arkworks' multicore CPU Pippenger at
2^20 (the reference publishes no absolute numbers, and this image has no Rust
toolchain to measure one; see BASELINE.md).

Timing notes (measured, round 2): the axon TPU tunnel's block_until_ready
does not block until execution — every timing must synchronize via a
device-to-host copy. First-run compiles are cached persistently in
.jax_cache/ inside the repo so driver re-runs skip the (large) XLA sort
compile.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")  # default device (TPU when present)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _setup_jax():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return jax


def _sync(x):
    # device->host copy: the only reliable barrier through the axon tunnel
    return np.asarray(x)


def bench_msm(log_n: int, curve_name: str = "bls12_381", iters: int = 3):
    jax = _setup_jax()
    import jax.numpy as jnp

    from zkarray.curves import bls12_381, bn254
    from zkarray.ec import msm as msm_mod
    from zkarray.ec.sw import AffinePoints

    curve = {"bls12_381": bls12_381.G1, "bn254": bn254.G1}[curve_name]
    n = 1 << log_n
    rng = np.random.default_rng(0)

    # Synthetic but valid point batch: tile a small set of precomputed
    # multiples of G (throughput is independent of point values).
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from ec_oracle import ec_mul

    base_n = 64
    gen = (curve.gen_x, curve.gen_y)
    base_pts = [
        ec_mul(gen, int(k), curve.a_int, curve.base.modulus)
        for k in rng.integers(1, 1 << 30, size=base_n)
    ]
    A0 = curve.affine_from_ints(base_pts)
    reps = n // base_n
    px = np.tile(np.asarray(A0.x), (1, reps))
    py = np.tile(np.asarray(A0.y), (1, reps))
    pinf = np.zeros(n, dtype=bool)

    # random full-width scalars below the modulus (top limb trimmed)
    Ls = curve.scalar.num_limbs
    sc = rng.integers(0, 1 << 16, size=(Ls, n), dtype=np.uint32)
    sc[-1] >>= 2

    A = AffinePoints(jnp.asarray(px), jnp.asarray(py), jnp.asarray(pinf))
    s = jnp.asarray(sc)

    out = msm_mod.msm(curve, A, s)
    _sync(out.zz)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = msm_mod.msm(curve, A, s)
    _sync(out.zz)
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt


def bench_ntt(log_n: int, iters: int = 5):
    jax = _setup_jax()
    import jax.numpy as jnp

    from zkarray.curves import bls12_381
    from zkarray.poly.domain import Radix2Domain

    spec = bls12_381.FR
    n = 1 << log_n
    dom = Radix2Domain(spec, n)
    rng = np.random.default_rng(1)
    limbs = rng.integers(0, 1 << 16, size=(spec.num_limbs, n), dtype=np.uint32)
    limbs[-1] >>= 2
    a = jnp.asarray(limbs)
    out = dom.fft(a)
    _sync(out[0, :4])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = dom.fft(a)
    _sync(out[0, :4])
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--msm-log-n", type=int, default=18)
    ap.add_argument("--ntt-log-n", type=int, default=20)
    ap.add_argument("--what", default="both", choices=["msm", "ntt", "both"])
    args = ap.parse_args()

    results = {}
    if args.what in ("msm", "both"):
        pts_per_s, dt = bench_msm(args.msm_log_n)
        results = {
            "metric": f"bls12_381_g1_msm_2^{args.msm_log_n}_points_per_s",
            "value": round(pts_per_s, 1),
            "unit": "points/s",
            "vs_baseline": round(pts_per_s / 1.0e6, 4),
            "msm_seconds": round(dt, 4),
        }
    if args.what in ("ntt", "both"):
        eps, dt = bench_ntt(args.ntt_log_n)
        extra = {
            "ntt_metric": f"bls12_381_fr_ntt_2^{args.ntt_log_n}_elems_per_s",
            "ntt_value": round(eps, 1),
            "ntt_seconds": round(dt, 4),
        }
        if results:
            results.update(extra)
        else:
            results = {
                "metric": extra["ntt_metric"],
                "value": extra["ntt_value"],
                "unit": "elems/s",
                "vs_baseline": round(eps / 1.0e7, 4),
            }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
