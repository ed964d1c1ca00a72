"""BN254 pairing property tests (bilinearity / non-degeneracy / GT order)."""

import numpy as np

from zkarray.curves import bn254 as b
from zkarray.ec import sw, sw_ext
from zkarray.ec.pairing import bls12 as bls  # fp12_pow_const
from zkarray.ec.pairing import bn


def test_g2_generator_on_curve():
    Q = b.G2.generator((1,))
    assert np.asarray(sw_ext.is_on_curve(b.G2, Q)).all()


def test_bn_pairing_bilinear():
    import jax.numpy as jnp

    F12 = b.FQ12
    G = b.G1.generator((1,))
    G2j = sw_ext.from_affine(b.G2, b.G2.generator((1,)))
    H2 = sw_ext.to_affine(b.G2, sw_ext.double(b.G2, G2j))
    G_dbl = sw.to_affine(b.G1, sw.jac_double(b.G1, sw.from_affine(b.G1, G)))
    H = b.G2.generator((1,))

    def cat_g1(a, c):
        return sw.AffinePoints(
            jnp.concatenate([a.x, c.x], axis=1),
            jnp.concatenate([a.y, c.y], axis=1),
            jnp.concatenate([a.inf, c.inf]),
        )

    def cat_g2(a, c):
        return sw_ext.ExtAffine(
            jnp.concatenate([a.x, c.x], axis=-1),
            jnp.concatenate([a.y, c.y], axis=-1),
            jnp.concatenate([a.inf, c.inf]),
        )

    P = cat_g1(cat_g1(G_dbl, G), G)
    Q = cat_g2(cat_g2(H, H2), H)
    gts = bn.pairing_each(b.PAIRING, P, Q)
    e2g_h = gts[..., 0:1]
    eg_2h = gts[..., 1:2]
    eg_h = gts[..., 2:3]
    assert np.asarray(F12.eq(e2g_h, eg_2h)).all()
    assert np.asarray(F12.eq(e2g_h, F12.sqr(eg_h))).all()
    one = F12.one((1,))
    assert not np.asarray(F12.eq(eg_h, one)).all()
    gt_r = bls.fp12_pow_const(F12, eg_h, b.FR.modulus)
    assert np.asarray(F12.eq(gt_r, one)).all()
