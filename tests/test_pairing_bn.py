"""BN254 pairing property tests (bilinearity / non-degeneracy / GT order).

Assertions derive from pairing_bundle's single width-4 pairing_each call
(one Miller-ladder compile per session; see pairing_bundle docstring)."""

import numpy as np

import pairing_bundle
from zkarray.curves import bn254 as b
from zkarray.ec import sw_ext
from zkarray.ec.pairing import bls12 as bls  # fp12_pow_const


def test_g2_generator_on_curve():
    Q = b.G2.generator((1,))
    assert np.asarray(sw_ext.is_on_curve(b.G2, Q)).all()


def test_bn_pairing_bilinear():
    F12 = b.FQ12
    gts = pairing_bundle.bn254()["gts"]
    eg_h = gts[..., 0:1]
    e2g_h = gts[..., 1:2]
    eg_2h = gts[..., 2:3]
    assert np.asarray(F12.eq(e2g_h, eg_2h)).all()
    assert np.asarray(F12.eq(e2g_h, F12.sqr(eg_h))).all()
    one = F12.one((1,))
    assert not np.asarray(F12.eq(eg_h, one)).all()
    gt_r = bls.fp12_pow_const(F12, eg_h, b.FR.modulus)
    assert np.asarray(F12.eq(gt_r, one)).all()


def test_bn_infinity_and_product():
    F12 = b.FQ12
    bd = pairing_bundle.bn254()
    gts = bd["gts"]
    assert np.asarray(F12.eq(gts[..., 3:4], F12.one((1,)))).all()
    want = F12.mul(
        F12.mul(gts[..., 0:1], gts[..., 1:2]),
        F12.mul(gts[..., 2:3], gts[..., 3:4]),
    )
    prod = bd["prod"]
    assert np.asarray(F12.eq(prod.reshape(prod.shape + (1,)), want)).all()
