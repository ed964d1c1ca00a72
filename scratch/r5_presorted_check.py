"""Round-5 lab check: presorted-kernel MSM path vs XLA fallback + host oracle.

Runs the interpret-mode Pallas path (CPU) at a small size where the kernel
gate opens (bn254, c=8 -> W*half = 4096), including edge cases: points at
infinity, zero scalars, duplicate points (doubling edge), negated digits.

Usage: ZKARRAY_MSM_TILE_T=2 ZKARRAY_PALLAS_INTERPRET=1 JAX_PLATFORMS=cpu \
    python scratch/r5_presorted_check.py
(T=2 keeps the interpreter's per-op eager cost tolerable)
"""
import os
import sys

os.environ.setdefault("ZKARRAY_MSM_TILE_T", "2")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np
import jax.numpy as jnp

from zkarray.curves import bn254
from zkarray.ec import msm as msm_mod, sw
from zkarray.ec.sw import AffinePoints
from ec_oracle import ec_mul, ec_add


def main():
    curve = bn254.G1
    mod = curve.base.modulus
    r = curve.scalar.modulus
    gen = (curve.gen_x, curve.gen_y)
    rng = np.random.default_rng(5)
    n = 256
    ks = [int(k) for k in rng.integers(1, 1 << 20, size=n)]
    pts = [ec_mul(gen, k, curve.a_int, mod) for k in ks]
    # duplicates (force doubling edges in shared buckets) + infinities
    pts[10] = pts[11]
    pts[12] = None
    pts[13] = None
    scalars_int = [int(s) for s in rng.integers(0, 1 << 63, size=n)]
    scalars_int[5] = 0
    scalars_int[6] = r - 1  # full-width scalar -> negative digits
    scalars_int[10] = scalars_int[11]

    A = curve.affine_from_ints(pts)
    Ls = curve.scalar.num_limbs
    sc = np.zeros((Ls, n), dtype=np.uint32)
    for j, s in enumerate(scalars_int):
        for i in range(Ls):
            sc[i, j] = (s >> (16 * i)) & 0xFFFF
    sc = jnp.asarray(sc)

    # host oracle
    want = None
    for P, s in zip(pts, scalars_int):
        if P is None:
            continue
        q = ec_mul(P, s % r, curve.a_int, mod)
        want = q if want is None else ec_add(want, q, curve.a_int, mod)

    for c in (8,):
        res = msm_mod.msm(curve, A, sc, c=c)
        got = curve.affine_to_ints(
            sw.xyzz_to_affine(
                curve, sw.XYZZPoints(*(v.reshape(v.shape + (1,)) for v in res))
            )
        )[0]
        ok = got == want
        print(f"c={c}: {'OK' if ok else 'MISMATCH'} got={got} want={want}")
        assert ok
    print("presorted path parity: PASS")


if __name__ == "__main__":
    main()
