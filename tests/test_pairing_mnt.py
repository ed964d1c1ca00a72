"""MNT4-298 / MNT6-298 pairing tests: bilinearity, non-degeneracy, GT order
(the reference's test_pairing! suite, test-templates/src/pairing.rs:2-67,
instantiated for the MNT cycle)."""

# Fast-tier budget: the D-twist/BW6/MNT engines each compile their own
# Miller ladder (minutes cold on a 2-CPU box); BLS12-381 + BN254 cover the
# pairing surface in the default tier, these run under `pytest -m slow`
# (the reference gates its heavy-curve suites the same way, ci.yml:213+).
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp
import numpy as np
import pytest

from zkarray.curves import mnt4_298, mnt6_298
from zkarray.ec import sw, sw_ext
from zkarray.ec.pairing import mnt


def _cat_g1(a, c):
    return sw.AffinePoints(
        jnp.concatenate([a.x, c.x], axis=1),
        jnp.concatenate([a.y, c.y], axis=1),
        jnp.concatenate([a.inf, c.inf]),
    )


def _cat_g2(a, c):
    return sw_ext.ExtAffine(
        jnp.concatenate([a.x, c.x], axis=-1),
        jnp.concatenate([a.y, c.y], axis=-1),
        jnp.concatenate([a.inf, c.inf]),
    )


@pytest.mark.parametrize("mod", [mnt4_298, mnt6_298], ids=["mnt4_298", "mnt6_298"])
def test_g2_generator_on_curve(mod):
    Q = mod.G2.generator((1,))
    assert np.asarray(sw_ext.is_on_curve(mod.G2, Q)).all()


@pytest.mark.parametrize("mod", [mnt4_298, mnt6_298], ids=["mnt4_298", "mnt6_298"])
def test_pairing_bilinear(mod):
    T = mod.PAIRING.gt
    G = mod.G1.generator((1,))
    G1j = sw.from_affine(mod.G1, G)
    G_dbl = sw.to_affine(mod.G1, sw.jac_double(mod.G1, G1j))
    H = mod.G2.generator((1,))
    G2j = sw_ext.from_affine(mod.G2, H)
    H2 = sw_ext.to_affine(mod.G2, sw_ext.double(mod.G2, G2j))

    # pairs: (2G, H), (G, 2H), (G, H)
    P = _cat_g1(_cat_g1(G_dbl, G), G)
    Q = _cat_g2(_cat_g2(H, H2), H)
    gts = mnt.pairing_each(mod.PAIRING, P, Q)
    e2g_h = gts[..., 0:1]
    eg_2h = gts[..., 1:2]
    eg_h = gts[..., 2:3]
    assert np.asarray(T.eq(e2g_h, eg_2h)).all()
    assert np.asarray(T.eq(e2g_h, T.sqr(eg_h))).all()
    # non-degeneracy
    one = T.one((1,))
    assert not np.asarray(T.eq(eg_h, one)).all()
    # GT order r
    gt_r = mnt.ext_pow_const(T, eg_h, mod.FR.modulus)
    assert np.asarray(T.eq(gt_r, one)).all()


@pytest.mark.parametrize("mod", [mnt4_298, mnt6_298], ids=["mnt4_298", "mnt6_298"])
def test_pairing_with_infinity(mod):
    T = mod.PAIRING.gt
    G = mod.G1.generator((1,))
    Ginf = sw.AffinePoints(G.x, G.y, jnp.ones((1,), dtype=bool))
    Q = mod.G2.generator((1,))
    gt = mnt.pairing_each(mod.PAIRING, Ginf, Q)
    assert np.asarray(T.eq(gt, T.one((1,)))).all()
