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


HBM_GBS = float(os.environ.get("ZKARRAY_HBM_GBS", 446e9))  # measured stream rate


def ntt_roofline(log_n: int, L: int, mul_rate: float, measured_dt=None):
    """Per-phase cost model of fft_fourstep_big (poly/domain.py:137) at
    size n = 2^log_n with L-limb elements, against the measured kernel
    mul rate and HBM stream rate — the round-5 answer to "NTT has no
    roofline" (reference ladder being replaced:
    poly/src/domain/radix2/fft.rs:213-295).

    Work model: two sub-FFT passes of log2(sqrt n) fused butterfly stages
    (n/2 muls per stage), one k1-twiddle multiply (n muls), the per-block
    twiddle-table doubling build (~n muls), plus bit-reversal gathers and
    one transpose on the HBM side."""
    n = 1 << log_n
    half_log = (log_n + 1) // 2
    stages = 2 * half_log  # both passes
    bytes_elem = L * 4
    data = n * bytes_elem

    muls = {
        "butterfly_stages": (stages * n) // 2,
        "k1_twiddle_mul": n,
        "twiddle_table_build": n + (1 << (log_n - half_log)),
    }
    mul_total = sum(muls.values())
    t_compute = mul_total / mul_rate

    hbm = {
        "butterfly_stages_rw": stages * 2 * data,  # fused kernel: 1R + 1W
        "bitrev_gathers": 2 * 2 * data,
        "transpose": 2 * data,
        "twiddle_mul_rw": 2 * data,
    }
    hbm_total = sum(hbm.values())
    t_hbm = hbm_total / HBM_GBS

    out = {
        "metric": f"ntt_2^{log_n}_roofline",
        "mont_muls": mul_total,
        "mul_breakdown": muls,
        "hbm_bytes": hbm_total,
        "hbm_breakdown_gb": {k: round(v / 1e9, 2) for k, v in hbm.items()},
        "t_compute_floor_s": round(t_compute, 4),
        "t_hbm_floor_s": round(t_hbm, 4),
        "combined_floor_s": round(max(t_compute, t_hbm), 4),
        "mul_rate_used": mul_rate,
        "hbm_gbs_used": HBM_GBS,
    }
    if measured_dt:
        out["measured_s"] = round(measured_dt, 4)
        out["roofline_fraction"] = round(
            max(t_compute, t_hbm) / measured_dt, 4
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--curve", default="bls12_381")
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--op", default="mul", choices=["mul", "ntt"])
    args = ap.parse_args()

    if args.op == "ntt":
        # measure fft at the given size, then print the phase model
        import jax
        import jax.numpy as jnp
        from zkarray.jaxcache import setup_cache

        setup_cache()
        from zkarray.curves import bls12_381
        from zkarray.poly.domain import Radix2Domain

        spec = bls12_381.FR
        n = 1 << args.log_n
        dom = Radix2Domain(spec, n)
        rng = np.random.default_rng(1)
        limbs = rng.integers(0, 1 << 16, size=(spec.num_limbs, n), dtype=np.uint32)
        limbs[-1] >>= 2
        a = jnp.asarray(limbs)
        out = dom.fft(a)
        np.asarray(out[0, :2])
        t0 = time.perf_counter()
        iters = max(2, args.iters // 2)
        for _ in range(iters):
            out = dom.fft(a)
        np.asarray(out[0, :2])
        dt = (time.perf_counter() - t0) / iters
        mul_rate = float(os.environ.get("ZKARRAY_MUL_RATE", 690e6))
        print(json.dumps(ntt_roofline(args.log_n, spec.num_limbs, mul_rate, dt)))
        return

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
