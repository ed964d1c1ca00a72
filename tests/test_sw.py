"""Short-Weierstrass group-law tests vs the Python-int oracle.

Mirrors the reference's test_group! suite (test-templates/src/groups.rs:
438-464): group laws, edge cases (∞, P + (-P), P + P), affine round trips,
scalar-mul consistency; oracle-checked like msm.rs checks Pippenger vs naive.
"""

import random

import numpy as np
import pytest

from ec_oracle import ec_add, ec_mul, ec_neg
from zkarray.curves import bls12_381, bn254
from zkarray.ec import sw
from zkarray.ff import fp

CURVES = [bn254.G1, bls12_381.G1]


def gen_points(curve, ks):
    g = (curve.gen_x, curve.gen_y)
    return [ec_mul(g, k, curve.a_int, curve.base.modulus) if k else None for k in ks]


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_generator_on_curve(curve):
    A = curve.generator((1,))
    assert np.asarray(sw.is_on_curve(curve, A)).all()


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_add_double_vs_oracle(curve):
    mod, a = curve.base.modulus, curve.a_int
    rng = random.Random(1)
    ks1 = [0, 1, 1, 5, rng.randrange(curve.scalar.modulus), 7, 0, 9]
    ks2 = [0, 1, 2, 5, rng.randrange(curve.scalar.modulus), 0, 3, -9 % curve.scalar.modulus]
    p1 = gen_points(curve, ks1)
    p2 = gen_points(curve, ks2)
    A1, A2 = curve.affine_from_ints(p1), curve.affine_from_ints(p2)
    # full jacobian add (includes P+P, P+(-P), ∞ cases)
    J = sw.jac_add(curve, sw.from_affine(curve, A1), sw.from_affine(curve, A2))
    got = curve.affine_to_ints(sw.to_affine(curve, J))
    want = [ec_add(p, q, a, mod) for p, q in zip(p1, p2)]
    assert got == want
    # mixed add
    Jm = sw.jac_add_mixed(curve, sw.from_affine(curve, A1), A2)
    assert curve.affine_to_ints(sw.to_affine(curve, Jm)) == want
    # double
    D = sw.jac_double(curve, sw.from_affine(curve, A1))
    assert curve.affine_to_ints(sw.to_affine(curve, D)) == [
        ec_add(p, p, a, mod) for p in p1
    ]


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_xyzz_vs_oracle(curve):
    mod, a = curve.base.modulus, curve.a_int
    ks1 = [0, 1, 1, 4, 11, 0, 8, 3]
    ks2 = [0, 1, 2, 4, -11 % curve.scalar.modulus, 5, 0, 2]
    p1, p2 = gen_points(curve, ks1), gen_points(curve, ks2)
    A1, A2 = curve.affine_from_ints(p1), curve.affine_from_ints(p2)
    B = sw.xyzz_add_affine(curve, sw.xyzz_from_affine(curve, A1), A2)
    want = [ec_add(p, q, a, mod) for p, q in zip(p1, p2)]
    assert curve.affine_to_ints(sw.xyzz_to_affine(curve, B)) == want
    # xyzz + xyzz full add
    B2 = sw.xyzz_add(
        curve, sw.xyzz_from_affine(curve, A1), sw.xyzz_from_affine(curve, A2)
    )
    assert curve.affine_to_ints(sw.xyzz_to_affine(curve, B2)) == want
    # xyzz double
    D = sw.xyzz_double(curve, sw.xyzz_from_affine(curve, A1))
    assert curve.affine_to_ints(sw.xyzz_to_affine(curve, D)) == [
        ec_add(p, p, a, mod) for p in p1
    ]


@pytest.mark.parametrize("curve", [bn254.G1], ids=lambda c: c.name)
def test_scalar_mul(curve):
    mod, a = curve.base.modulus, curve.a_int
    rng = random.Random(3)
    ks = [1, 2, 3, 5]
    scalars = [0, 1, rng.randrange(curve.scalar.modulus), curve.scalar.modulus - 1]
    pts = gen_points(curve, ks)
    A = curve.affine_from_ints(pts)
    s = fp.from_ints(curve.scalar, scalars, mont=False)
    got = curve.affine_to_ints(sw.to_affine(curve, sw.scalar_mul(curve, A, s)))
    want = [ec_mul(p, k, a, mod) for p, k in zip(pts, scalars)]
    assert got == want


@pytest.mark.parametrize("curve", [bn254.G1], ids=lambda c: c.name)
def test_subgroup_and_cofactor(curve):
    A = curve.generator((2,))
    assert np.asarray(sw.subgroup_check(curve, A)).all()
