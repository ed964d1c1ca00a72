"""Endomorphism-based BLS12-381 subgroup checks vs the generic full-mul
check (reference curves/bls12_381/src/curves/{g1.rs:69-85, g2.rs:75-88} and
its positive/negative subgroup tests, curves/tests/mod.rs:18-68)."""

import numpy as np
import jax.numpy as jnp

from zkarray.curves import bls12_381 as b
from zkarray.ec import fast_checks, sw, sw_ext


def test_g1_fast_subgroup_check():
    G = b.G1.generator((1,))
    # in-subgroup points: G, 2G, ∞
    Gj = sw.from_affine(b.G1, G)
    G2a = sw.to_affine(b.G1, sw.jac_double(b.G1, Gj))
    inf = sw.AffinePoints(G.x, G.y, jnp.ones(1, dtype=bool))
    good = sw.AffinePoints(
        jnp.concatenate([G.x, G2a.x, inf.x], axis=1),
        jnp.concatenate([G.y, G2a.y, inf.y], axis=1),
        jnp.concatenate([G.inf, G2a.inf, inf.inf]),
    )
    ok = fast_checks.bls12_381_g1_subgroup_check(b.G1, good)
    assert np.asarray(ok).all()

    # out-of-subgroup point: any curve point with cofactor unmangled —
    # find one by hashing x until on-curve, then verify the slow check
    # agrees it's bad
    from zkarray.ff import fp

    p = b.FQ.modulus
    x = 3
    while True:
        rhs = (x**3 + 4) % p
        y = pow(rhs, (p + 1) // 4, p)
        if (y * y) % p == rhs:
            break
        x += 1
    cand = b.G1.affine_from_ints([(x, y)])
    fast = np.asarray(fast_checks.bls12_381_g1_subgroup_check(b.G1, cand))[0]
    slow = np.asarray(sw.subgroup_check(b.G1, cand))[0]
    assert fast == slow  # (with overwhelming probability: False)


def test_g2_fast_subgroup_check():
    H = b.G2.generator((1,))
    Hj = sw_ext.from_affine(b.G2, H)
    H2 = sw_ext.to_affine(b.G2, sw_ext.double(b.G2, Hj))
    ok1 = fast_checks.bls12_381_g2_subgroup_check(b.G2, H)
    ok2 = fast_checks.bls12_381_g2_subgroup_check(b.G2, H2)
    assert np.asarray(ok1).all() and np.asarray(ok2).all()
