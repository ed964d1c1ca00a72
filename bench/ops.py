"""Per-operation microbenchmarks — the reference's criterion bench surface.

Reference analog: ark-algebra-bench-templates' per-field and per-curve
criterion suites (bench-templates/src/macros/field.rs:2-100, macros/ec.rs,
macros/pairing.rs) — add/sub/mul/square/inverse/sqrt per field, group
add/double/scalar-mul/MSM, and full pairing per curve.

Usage:  python bench/ops.py [--curve bls12_381] [--log-n 18] [--ops all]
Prints one JSON dict with <op>_per_s entries.

Timing notes: the axon tunnel's block_until_ready doesn't block, so every
measurement syncs via a device->host copy; per-op throughput is measured by
chaining K dependent iterations inside one jit so the ~5 ms sync floor and
dispatch overheads amortize (same technique as bench/roofline.py).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from zkarray.jaxcache import setup_cache

jax = setup_cache()
import jax.numpy as jnp  # noqa: E402


def _sync(x):
    return np.asarray(x)


def _chain(fn, x, k):
    """x -> fn(fn(...fn(x))) k times, one jit."""

    @jax.jit
    def run(x):
        for _ in range(k):
            x = fn(x)
        return x

    return run


def _time(run, x, iters=4):
    out = run(x)
    _sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(out)
    _sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def bench_field(spec, n, results, prefix):
    from zkarray.ff import fp

    rng = np.random.default_rng(0)
    L = spec.num_limbs
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32))
    b = jnp.asarray(rng.integers(1, 1 << 16, size=(L, n), dtype=np.uint32))
    K = 16  # chains amortize the ~46 ms axon dispatch round-trip;
    # much longer chains hit pathological XLA compile times (round 4)
    cases = {
        "add": lambda x: fp.add(spec, x, b),
        "sub": lambda x: fp.sub(spec, x, b),
        "mul": lambda x: fp.mont_mul(spec, x, b),
        "sqr": lambda x: fp.mont_sqr(spec, x),
    }
    for name, fn in cases.items():
        dt = _time(_chain(fn, a, K), a)
        results[f"{prefix}_{name}_per_s"] = round(K * n / dt, 1)
    # inverse & sqrt are whole-batch ops (no chaining: result feeds back)
    dt = _time(_chain(lambda x: fp.batch_inv(spec, x), a, 1), a)
    results[f"{prefix}_batch_inv_per_s"] = round(n / dt, 1)
    dt = _time(_chain(lambda x: fp.sqrt(spec, x)[0], a, 1), a)
    results[f"{prefix}_sqrt_per_s"] = round(n / dt, 1)


def bench_group(curve, n, results, prefix):
    from zkarray.ec import sw

    rng = np.random.default_rng(1)
    L = curve.base.num_limbs
    x = jnp.asarray(rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32))
    P = sw.XYZZPoints(x, x, x, x)
    A = sw.AffinePoints(x, x, jnp.zeros(n, dtype=bool))
    K = 8
    dt = _time(_chain(lambda Q: sw.xyzz_add_affine(curve, Q, A), P, K), P)
    results[f"{prefix}_mixed_add_per_s"] = round(K * n / dt, 1)
    dt = _time(_chain(lambda Q: sw.xyzz_double(curve, Q), P, K), P)
    results[f"{prefix}_double_per_s"] = round(K * n / dt, 1)
    dt = _time(_chain(lambda Q: sw.xyzz_add(curve, Q, P), P, K), P)
    results[f"{prefix}_full_add_per_s"] = round(K * n / dt, 1)


def bench_pairing(results, n_pairs=8):
    """Full BLS12-381 pairing: G2 prepare + multi-Miller + final exp."""
    import sys as _s

    _s.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from zkarray.curves import bls12_381
    from zkarray.ec.pairing import bls12

    eng = bls12_381.PAIRING
    g1 = bls12_381.G1.generator((n_pairs,)) if hasattr(bls12_381.G1, "generator") else None
    # build batched generator copies from config ints
    from zkarray.ec.sw import AffinePoints
    from zkarray.ff import fp

    c = bls12_381.G1
    gx = fp.from_ints(c.base, [c.gen_x] * n_pairs)
    gy = fp.from_ints(c.base, [c.gen_y] * n_pairs)
    P = AffinePoints(gx, gy, jnp.zeros(n_pairs, dtype=bool))
    F2 = bls12_381.FQ2
    from zkarray.ec.sw_ext import ExtAffine

    g2 = bls12_381.G2
    qx = F2.from_ints([[g2.gen_x[0]] * n_pairs, [g2.gen_x[1]] * n_pairs])
    qy = F2.from_ints([[g2.gen_y[0]] * n_pairs, [g2.gen_y[1]] * n_pairs])
    Q = ExtAffine(qx, qy, jnp.zeros(n_pairs, dtype=bool))

    t0 = time.perf_counter()
    out = bls12.pairing(eng, P, Q)
    _sync(jax.tree.leaves(out)[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = bls12.pairing(eng, P, Q)
    _sync(jax.tree.leaves(out)[0])
    dt = time.perf_counter() - t0
    results["bls12_381_pairing_per_s"] = round(n_pairs / dt, 2)
    results["bls12_381_pairing_compile_s"] = round(compile_s, 1)


def bench_pairing_bn254(results, n_pairs=8):
    """Full BN254 pairing (bench-templates/src/macros/pairing.rs analog)."""
    from zkarray.curves import bn254
    from zkarray.ec.pairing import bn
    from zkarray.ec.sw import AffinePoints
    from zkarray.ec.sw_ext import ExtAffine
    from zkarray.ff import fp

    c = bn254.G1
    gx = fp.from_ints(c.base, [c.gen_x] * n_pairs)
    gy = fp.from_ints(c.base, [c.gen_y] * n_pairs)
    P = AffinePoints(gx, gy, jnp.zeros(n_pairs, dtype=bool))
    F2 = bn254.FQ2
    g2 = bn254.G2
    qx = F2.from_ints([[g2.gen_x[0]] * n_pairs, [g2.gen_x[1]] * n_pairs])
    qy = F2.from_ints([[g2.gen_y[0]] * n_pairs, [g2.gen_y[1]] * n_pairs])
    Q = ExtAffine(qx, qy, jnp.zeros(n_pairs, dtype=bool))
    eng = bn254.PAIRING

    t0 = time.perf_counter()
    out = bn.pairing(eng, P, Q)
    _sync(jax.tree.leaves(out)[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = bn.pairing(eng, P, Q)
    _sync(jax.tree.leaves(out)[0])
    dt = time.perf_counter() - t0
    results["bn254_pairing_per_s"] = round(n_pairs / dt, 2)
    results["bn254_pairing_compile_s"] = round(compile_s, 1)


def bench_pairing_wide(results, widths=(256, 1024, 4096), curves=("bls12_381", "bn254")):
    """Batch-pairing THROUGHPUT at real widths (the round-4 width-8 row was
    dispatch/latency-bound: the ~370 sequential tower ops of the Miller
    ladder + final exp dominate at tiny batch; the pairs axis is the VPU
    batch axis, so throughput grows ~linearly until the lanes fill).
    Distinct per-pair inputs: P_i = i·G1 scaled ladder is host-costly, so
    pairs are (a_i·G, Q) with a_i from a cheap doubling ladder built on
    device. Reference: bench-templates/src/macros/pairing.rs;
    BASELINE.json config #5."""
    from zkarray.curves import bls12_381, bn254
    from zkarray.ec import sw
    from zkarray.ec.sw import AffinePoints
    from zkarray.ec.sw_ext import ExtAffine
    from zkarray.ff import fp

    mods = {"bls12_381": (bls12_381, __import__("zkarray.ec.pairing.bls12", fromlist=["x"])),
            "bn254": (bn254, __import__("zkarray.ec.pairing.bn", fromlist=["x"]))}
    for cname in curves:
        curve_mod, pair_mod = mods[cname]
        c = curve_mod.G1
        eng = curve_mod.PAIRING
        F2 = curve_mod.FQ2
        g2 = curve_mod.G2
        for n_pairs in widths:
            # distinct P_i: 2^i-fold doublings of G batched on device is
            # O(n) sequential — instead tile 64 host multiples of G
            base_n = min(64, n_pairs)
            import sys as _s, os as _o
            _s.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "tests"))
            from ec_oracle import ec_mul
            import numpy as _np
            pts = [ec_mul((c.gen_x, c.gen_y), 3 + i, c.a_int, c.base.modulus)
                   for i in range(base_n)]
            A0 = c.affine_from_ints(pts)
            reps = n_pairs // base_n
            P = AffinePoints(
                jnp.asarray(_np.tile(_np.asarray(A0.x), (1, reps))),
                jnp.asarray(_np.tile(_np.asarray(A0.y), (1, reps))),
                jnp.zeros(n_pairs, dtype=bool),
            )
            qx = F2.from_ints([[g2.gen_x[0]] * n_pairs, [g2.gen_x[1]] * n_pairs])
            qy = F2.from_ints([[g2.gen_y[0]] * n_pairs, [g2.gen_y[1]] * n_pairs])
            Q = ExtAffine(qx, qy, jnp.zeros(n_pairs, dtype=bool))
            t0 = time.perf_counter()
            out = pair_mod.pairing(eng, P, Q)
            _sync(jax.tree.leaves(out)[0])
            compile_s = time.perf_counter() - t0
            iters = 3 if n_pairs <= 1024 else 2
            t0 = time.perf_counter()
            for _ in range(iters):
                out = pair_mod.pairing(eng, P, Q)
            _sync(jax.tree.leaves(out)[0])
            dt = (time.perf_counter() - t0) / iters
            results[f"{cname}_pairing_per_s_w{n_pairs}"] = round(n_pairs / dt, 1)
            results[f"{cname}_pairing_batch_seconds_w{n_pairs}"] = round(dt, 3)
            results[f"{cname}_pairing_compile_s_w{n_pairs}"] = round(compile_s, 1)
            print(json.dumps(results), flush=True)  # bank incrementally


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=18)
    ap.add_argument("--ops", default="all",
                    choices=["all", "field", "group", "pairing", "pairing_wide"])
    ap.add_argument("--widths", default="256,1024,4096")
    args = ap.parse_args()
    n = 1 << args.log_n
    results = {"batch_log_n": args.log_n}

    from zkarray.curves import bls12_381, bn254

    if args.ops in ("all", "field"):
        bench_field(bls12_381.FR, n, results, "bls12_381_fr")
        bench_field(bls12_381.FQ, n, results, "bls12_381_fq")
        bench_field(bn254.FR, n, results, "bn254_fr")
    if args.ops in ("all", "group"):
        bench_group(bls12_381.G1, n, results, "bls12_381_g1")
    if args.ops in ("all", "pairing"):
        bench_pairing(results)
        bench_pairing_bn254(results)
    if args.ops == "pairing_wide":
        bench_pairing_wide(
            results, widths=tuple(int(w) for w in args.widths.split(","))
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
