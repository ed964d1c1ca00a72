"""BW6-761 pairing tests: bilinearity, non-degeneracy, GT order
(test-templates/src/pairing.rs:2-67 instantiated for BW6-761).

761-bit field (L = 48 limbs) — one bilinearity instance keeps runtime sane.
"""

# Fast-tier budget: the D-twist/BW6/MNT engines each compile their own
# Miller ladder (minutes cold on a 2-CPU box); BLS12-381 + BN254 cover the
# pairing surface in the default tier, these run under `pytest -m slow`
# (the reference gates its heavy-curve suites the same way, ci.yml:213+).
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp
import numpy as np

from zkarray.curves import bw6_761 as b
from zkarray.ec import sw
from zkarray.ec.pairing import bw6, mnt


def _cat(a, c):
    return sw.AffinePoints(
        jnp.concatenate([a.x, c.x], axis=1),
        jnp.concatenate([a.y, c.y], axis=1),
        jnp.concatenate([a.inf, c.inf]),
    )


def test_generators_on_curve():
    for curve in (b.G1, b.G2):
        A = curve.generator((1,))
        assert np.asarray(sw.is_on_curve(curve, A)).all()


def test_pairing_bilinear():
    T = b.FQ6
    G = b.G1.generator((1,))
    G_dbl = sw.to_affine(b.G1, sw.jac_double(b.G1, sw.from_affine(b.G1, G)))
    H = b.G2.generator((1,))
    H_dbl = sw.to_affine(b.G2, sw.jac_double(b.G2, sw.from_affine(b.G2, H)))

    P = _cat(_cat(G_dbl, G), G)
    Q = _cat(_cat(H, H_dbl), H)
    gts = bw6.pairing_each(b.PAIRING, P, Q)
    e2g_h = gts[..., 0:1]
    eg_2h = gts[..., 1:2]
    eg_h = gts[..., 2:3]
    assert np.asarray(T.eq(e2g_h, eg_2h)).all()
    assert np.asarray(T.eq(e2g_h, T.sqr(eg_h))).all()
    one = T.one((1,))
    assert not np.asarray(T.eq(eg_h, one)).all()
    gt_r = mnt.ext_pow_const(T, eg_h, b.FR.modulus)
    assert np.asarray(T.eq(gt_r, one)).all()
