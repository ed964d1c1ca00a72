"""BLS12-377 pairing: bilinearity + non-degeneracy — exercises the BLS12
engine's D-twist path (reference curves/bls12_377; test-templates/src/
pairing.rs:2-67)."""

# Fast-tier budget: the D-twist/BW6/MNT engines each compile their own
# Miller ladder (minutes cold on a 2-CPU box); BLS12-381 + BN254 cover the
# pairing surface in the default tier, these run under `pytest -m slow`
# (the reference gates its heavy-curve suites the same way, ci.yml:213+).
import pytest

pytestmark = pytest.mark.slow

import numpy as np

from zkarray.curves import bls12_377 as b
from zkarray.ec import sw, sw_ext
from zkarray.ec.pairing import bls12


def test_generators_on_curve():
    assert np.asarray(sw.is_on_curve(b.G1, b.G1.generator((1,)))).all()
    assert np.asarray(sw_ext.is_on_curve(b.G2, b.G2.generator((1,)))).all()


def test_pairing_bilinear_377():
    import jax.numpy as jnp

    F12 = b.FQ12
    G = b.G1.generator((1,))
    G1j = sw.from_affine(b.G1, G)
    G_dbl = sw.to_affine(b.G1, sw.jac_double(b.G1, G1j))
    H = b.G2.generator((1,))
    G2j = sw_ext.from_affine(b.G2, H)
    H2 = sw_ext.to_affine(b.G2, sw_ext.double(b.G2, G2j))

    P = sw.AffinePoints(
        jnp.concatenate([G_dbl.x, G.x, G.x], axis=1),
        jnp.concatenate([G_dbl.y, G.y, G.y], axis=1),
        jnp.concatenate([G_dbl.inf, G.inf, G.inf]),
    )
    Q = sw_ext.ExtAffine(
        jnp.concatenate([H.x, H2.x, H.x], axis=-1),
        jnp.concatenate([H.y, H2.y, H.y], axis=-1),
        jnp.concatenate([H.inf, H2.inf, H.inf]),
    )
    gts = bls12.pairing_each(b.PAIRING, P, Q)
    e2g_h, eg_2h, eg_h = gts[..., 0:1], gts[..., 1:2], gts[..., 2:3]
    assert np.asarray(F12.eq(e2g_h, eg_2h)).all()
    assert np.asarray(F12.eq(e2g_h, F12.sqr(eg_h))).all()
    assert not np.asarray(F12.eq(eg_h, F12.one((1,)))).all()
    # GT has order r
    gt_r = bls12.fp12_pow_const(F12, eg_h, b.FR.modulus)
    assert np.asarray(F12.eq(gt_r, F12.one((1,)))).all()
