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


def _log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

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

    _log(f"msm 2^{log_n}: inputs ready, compiling + first run...")
    out = msm_mod.msm(curve, A, s)
    _sync(out.zz)
    _log(f"msm 2^{log_n}: first run done, timing {iters} iters")
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
    _log(f"ntt 2^{log_n}: compiling + first run...")
    out = dom.fft(a)
    _sync(out[0, :4])
    _log(f"ntt 2^{log_n}: first run done, timing {iters} iters")
    t0 = time.perf_counter()
    for _ in range(iters):
        out = dom.fft(a)
    _sync(out[0, :4])
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt


def _worker(args):
    """Single measurement, prints one JSON fragment (internal)."""
    if args.worker == "msm":
        pts_per_s, dt = bench_msm(args.msm_log_n)
        print(json.dumps({"pts_per_s": pts_per_s, "dt": dt, "log_n": args.msm_log_n}))
    else:
        eps, dt = bench_ntt(args.ntt_log_n)
        print(json.dumps({"eps": eps, "dt": dt, "log_n": args.ntt_log_n}))


def _run_worker(what, log_n, timeout_s, extra_env=None):
    """Run one measurement in a SUBPROCESS: a TPU-worker crash (e.g. a
    kernel fault) then costs one measurement, not the whole bench."""
    import subprocess

    env = dict(os.environ)
    env.update(extra_env or {})
    flag = "--msm-log-n" if what == "msm" else "--ntt-log-n"
    cmd = [sys.executable, "-u", os.path.abspath(__file__), "--worker", what,
           flag, str(log_n)]
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s, env=env
        )
    except subprocess.TimeoutExpired:
        _log(f"{what} 2^{log_n}: worker timeout after {timeout_s}s")
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except Exception:
            continue
    _log(f"{what} 2^{log_n}: worker failed rc={out.returncode}: "
         f"{out.stderr.strip().splitlines()[-1] if out.stderr.strip() else ''}")
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--msm-log-n", type=int, default=18)
    ap.add_argument("--ntt-log-n", type=int, default=20)
    ap.add_argument("--what", default="both", choices=["msm", "ntt", "both"])
    ap.add_argument("--worker", default=None, choices=[None, "msm", "ntt"])
    ap.add_argument("--no-subprocess", action="store_true")
    args = ap.parse_args()
    if args.worker:
        return _worker(args)

    if args.no_subprocess:
        results = {}
        if args.what in ("msm", "both"):
            pts_per_s, dt = bench_msm(args.msm_log_n)
            results.update(msm={"pts_per_s": pts_per_s, "dt": dt})
        if args.what in ("ntt", "both"):
            eps, dt = bench_ntt(args.ntt_log_n)
            results.update(ntt={"eps": eps, "dt": dt})
        print(json.dumps(results))
        return

    results = {}
    if args.what in ("msm", "both"):
        # fallback ladder: full size → smaller size → XLA path (no pallas)
        attempts = [
            (args.msm_log_n, {}),
            (max(14, args.msm_log_n - 2), {}),
            (max(14, args.msm_log_n - 2), {"ZKARRAY_PALLAS": "0"}),
        ]
        for log_n, env in attempts:
            r = _run_worker("msm", log_n, timeout_s=1500, extra_env=env)
            if r:
                results = {
                    "metric": f"bls12_381_g1_msm_2^{r['log_n']}_points_per_s",
                    "value": round(r["pts_per_s"], 1),
                    "unit": "points/s",
                    "vs_baseline": round(r["pts_per_s"] / 1.0e6, 4),
                    "msm_seconds": round(r["dt"], 4),
                }
                break
    if args.what in ("ntt", "both"):
        for log_n in (args.ntt_log_n, max(16, args.ntt_log_n - 4)):
            r = _run_worker("ntt", log_n, timeout_s=900)
            if r:
                extra = {
                    "ntt_metric": f"bls12_381_fr_ntt_2^{r['log_n']}_elems_per_s",
                    "ntt_value": round(r["eps"], 1),
                    "ntt_seconds": round(r["dt"], 4),
                }
                if results:
                    results.update(extra)
                else:
                    results = {
                        "metric": extra["ntt_metric"],
                        "value": extra["ntt_value"],
                        "unit": "elems/s",
                        "vs_baseline": round(r["eps"] / 1.0e7, 4),
                    }
                break
    if not results:
        results = {
            "metric": "bench_failed",
            "value": 0,
            "unit": "n/a",
            "vs_baseline": 0.0,
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
