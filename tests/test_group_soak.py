"""Randomized group-law soak — the reference's test_group! runs 500
randomized iterations per model (test-templates/src/groups.rs:438-464);
here the 500 cases run as ONE batch through every XYZZ/Jacobian formula,
with edge classes (identity, doubling, cancellation) interleaved."""

import numpy as np
import pytest

from ec_oracle import ec_add, ec_mul, ec_neg
from zkarray.curves import bls12_381, bn254
from zkarray.ec import sw

import jax.numpy as jnp

N = 500


def _random_cases(curve, seed):
    rng = np.random.default_rng(seed)
    a, mod = curve.a_int, curve.base.modulus
    gen = (curve.gen_x, curve.gen_y)
    # base pool of random multiples
    pool = [ec_mul(gen, int(k), a, mod) for k in rng.integers(1, 1 << 28, size=40)]
    P, Q = [], []
    for i in range(N):
        cls = i % 10
        p = pool[int(rng.integers(0, len(pool)))]
        q = pool[int(rng.integers(0, len(pool)))]
        if cls == 7:
            q = p  # doubling
        elif cls == 8:
            q = ec_neg(p, mod)  # cancellation
        elif cls == 9:
            p = None if i % 20 == 9 else p  # identities
            q = None if i % 20 == 19 else q
        P.append(p)
        Q.append(q)
    return P, Q


@pytest.mark.parametrize("curvemod", [bls12_381, bn254], ids=lambda m: m.__name__)
def test_xyzz_group_law_soak(curvemod):
    curve = curvemod.G1
    a, mod = curve.a_int, curve.base.modulus
    P, Q = _random_cases(curve, 1234)
    Ap = curve.affine_from_ints(P)
    Aq = curve.affine_from_ints(Q)

    # mixed add (bucket formula): XYZZ(P) + affine(Q)
    got = curve.affine_to_ints(
        sw.xyzz_to_affine(
            curve, sw.xyzz_add_affine(curve, sw.xyzz_from_affine(curve, Ap), Aq)
        )
    )
    want = [ec_add(p, q, a, mod) for p, q in zip(P, Q)]
    assert got == want

    # full XYZZ add
    got2 = curve.affine_to_ints(
        sw.xyzz_to_affine(
            curve,
            sw.xyzz_add(
                curve,
                sw.xyzz_from_affine(curve, Ap),
                sw.xyzz_from_affine(curve, Aq),
            ),
        )
    )
    assert got2 == want

    # doubling
    got3 = curve.affine_to_ints(
        sw.xyzz_to_affine(
            curve, sw.xyzz_double(curve, sw.xyzz_from_affine(curve, Ap))
        )
    )
    assert got3 == [ec_add(p, p, a, mod) for p in P]


def test_jacobian_group_law_soak():
    curve = bls12_381.G1
    a, mod = curve.a_int, curve.base.modulus
    P, Q = _random_cases(curve, 777)
    Ap = curve.affine_from_ints(P)
    Aq = curve.affine_from_ints(Q)
    want = [ec_add(p, q, a, mod) for p, q in zip(P, Q)]
    got = curve.affine_to_ints(
        sw.to_affine(
            curve,
            sw.jac_add(
                curve, sw.from_affine(curve, Ap), sw.from_affine(curve, Aq)
            ),
        )
    )
    assert got == want
    got_m = curve.affine_to_ints(
        sw.to_affine(curve, sw.jac_add_mixed(curve, sw.from_affine(curve, Ap), Aq))
    )
    assert got_m == want
