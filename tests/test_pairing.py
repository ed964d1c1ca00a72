"""BLS12-381 pairing tests: bilinearity, non-degeneracy, GT order — the
reference's test_pairing! property suite (test-templates/src/pairing.rs:2-67).

All assertions derive from pairing_bundle's single width-4 pairing_each
call (+ one same-width combine=True call), so the family's Miller ladder
compiles once per test session.
"""

import numpy as np

import pairing_bundle
from zkarray.curves import bls12_381 as b
from zkarray.ec import sw_ext
from zkarray.ec.pairing import bls12


def test_g2_generator_on_curve():
    Q = b.G2.generator((1,))
    assert np.asarray(sw_ext.is_on_curve(b.G2, Q)).all()


def test_pairing_bilinear():
    F12 = b.FQ12
    gts = pairing_bundle.bls12_381()["gts"]
    eg_h = gts[..., 0:1]
    e2g_h = gts[..., 1:2]
    eg_2h = gts[..., 2:3]
    # bilinearity: e(2G,H) == e(G,2H) == e(G,H)^2
    assert np.asarray(F12.eq(e2g_h, eg_2h)).all()
    assert np.asarray(F12.eq(e2g_h, F12.sqr(eg_h))).all()
    # non-degeneracy
    one = F12.one((1,))
    assert not np.asarray(F12.eq(eg_h, one)).all()
    # GT has order r: e(G,H)^r == 1
    gt_r = bls12.fp12_pow_const(F12, eg_h, b.FR.modulus)
    assert np.asarray(F12.eq(gt_r, one)).all()


def test_multi_pairing_is_product():
    """pairing() (combine=True) equals the product of the per-pair values
    (reference multi_pairing semantics)."""
    F12 = b.FQ12
    bd = pairing_bundle.bls12_381()
    gts = bd["gts"]
    want = F12.mul(
        F12.mul(gts[..., 0:1], gts[..., 1:2]),
        F12.mul(gts[..., 2:3], gts[..., 3:4]),
    )
    prod = bd["prod"]
    assert np.asarray(F12.eq(prod.reshape(prod.shape + (1,)), want)).all()


def test_pairing_with_infinity():
    """Pair 3 of the bundle has an infinity G1 input -> contributes 1."""
    F12 = b.FQ12
    gts = pairing_bundle.bls12_381()["gts"]
    assert np.asarray(F12.eq(gts[..., 3:4], F12.one((1,)))).all()
