"""Roofline accounting for the hot kernels (BASELINE.json requirement).

The reference's only published perf claim is relative ("30-70% from asm",
README.md:62); BASELINE.json instead demands an absolute justification: how
close does the achieved field-mul throughput sit to the chip's int32-MAC
speed of light?

Model (documented, overridable): a TPU v5e TensorCore's VPU is an
8-sublane × 128-lane vector unit at ~0.94 GHz. 32-bit integer multiplies
run on the VPU (the MXU is bf16/int8-matmul only, unusable for the 16-bit
lazy-carry CIOS without a matmul reformulation), giving a peak of
    8 · 128 · 0.94e9 ≈ 0.96e12 int32 ops/s  (1 mul or 1 add per lane-cycle)
Set ZKARRAY_VPU_INT32_OPS to recalibrate on other chips.

Per Montgomery multiply (zkarray/ff/fp.py:mont_mul, lazy-column CIOS with
16-bit limbs in u32 lanes): L² MACs for a·b, L² for the reduction q·p, plus
~4L carry-sweep adds — counted below from the spec's limb count.

Usage:  python bench/roofline.py [--curve bls12_381] [--log-n 20]
Prints one JSON line: achieved mont_muls/s, int32 GMAC/s, roofline fraction.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VPU_INT32_OPS = float(os.environ.get("ZKARRAY_VPU_INT32_OPS", 8 * 128 * 0.94e9))


def macs_per_mont_mul(L: int) -> int:
    # a·b partial products: L·L widening MACs; reduction q_i·p: L·L;
    # column carry sweep ≈ 4·L adds (see fp.py mont_mul lazy columns)
    return 2 * L * L + 4 * L


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--curve", default="bls12_381")
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from zkarray.curves import bls12_381, bn254
    from zkarray.ff import fp

    spec = {"bls12_381": bls12_381.FQ, "bn254": bn254.FQ}[args.curve]
    L = spec.num_limbs
    n = 1 << args.log_n
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32))

    # chain K muls inside one jit so the ~5 ms sync floor amortizes
    K = 16

    @jax.jit
    def chain(a, b):
        x = a
        for _ in range(K):
            x = fp.mont_mul(spec, x, b)
        return x

    out = chain(a, b)
    np.asarray(out[0, :2])  # sync (axon block_until_ready is unreliable)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = chain(out, b)
    np.asarray(out[0, :2])
    dt = (time.perf_counter() - t0) / args.iters
    muls_per_s = K * n / dt
    macs = macs_per_mont_mul(L)
    achieved = muls_per_s * macs
    print(
        json.dumps(
            {
                "metric": f"{args.curve}_fq_mont_mul_per_s",
                "value": round(muls_per_s, 1),
                "unit": "mont_muls/s",
                "limbs": L,
                "int32_macs_per_mul": macs,
                "achieved_gmacs": round(achieved / 1e9, 2),
                "vpu_peak_gmacs": round(VPU_INT32_OPS / 1e9, 2),
                "roofline_fraction": round(achieved / VPU_INT32_OPS, 4),
                "seconds_per_iter": round(dt, 5),
            }
        )
    )


if __name__ == "__main__":
    main()
