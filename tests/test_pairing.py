"""BLS12-381 pairing tests: bilinearity, non-degeneracy, GT order — the
reference's test_pairing! property suite (test-templates/src/pairing.rs:2-67).
"""

import numpy as np

from zkarray.curves import bls12_381 as b
from zkarray.ec import sw, sw_ext
from zkarray.ec.pairing import bls12


def test_g2_generator_on_curve():
    Q = b.G2.generator((1,))
    assert np.asarray(sw_ext.is_on_curve(b.G2, Q)).all()


def test_pairing_bilinear():
    F12 = b.FQ12
    # G1 points: G, 2G ; G2 points: H, 2H
    G = b.G1.generator((1,))
    G2j = sw_ext.from_affine(b.G2, b.G2.generator((1,)))
    H2 = sw_ext.to_affine(b.G2, sw_ext.double(b.G2, G2j))
    G1j = sw.from_affine(b.G1, G)
    G_dbl = sw.to_affine(b.G1, sw.jac_double(b.G1, G1j))
    H = b.G2.generator((1,))

    def cat_g1(a, c):
        import jax.numpy as jnp

        return sw.AffinePoints(
            jnp.concatenate([a.x, c.x], axis=1),
            jnp.concatenate([a.y, c.y], axis=1),
            jnp.concatenate([a.inf, c.inf]),
        )

    def cat_g2(a, c):
        import jax.numpy as jnp

        return sw_ext.ExtAffine(
            jnp.concatenate([a.x, c.x], axis=-1),
            jnp.concatenate([a.y, c.y], axis=-1),
            jnp.concatenate([a.inf, c.inf]),
        )

    # pairs: (2G, H), (G, 2H), (G, H)
    P = cat_g1(cat_g1(G_dbl, G), G)
    Q = cat_g2(cat_g2(H, H2), H)
    gts = bls12.pairing_each(b.PAIRING, P, Q)
    e2g_h = gts[..., 0:1]
    eg_2h = gts[..., 1:2]
    eg_h = gts[..., 2:3]
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
    F12 = b.FQ12
    import jax.numpy as jnp

    G = b.G1.generator((2,))  # [G, G]
    Q = b.G2.generator((2,))
    # multi_pairing([G,G],[H,H]) == e(G,H)^2
    gt = bls12.pairing(b.PAIRING, G, Q)
    g1 = b.G1.generator((1,))
    q1 = b.G2.generator((1,))
    gt1 = bls12.pairing_each(b.PAIRING, g1, q1)
    assert np.asarray(F12.eq(gt.reshape(gt.shape + (1,)), F12.sqr(gt1))).all()


def test_pairing_with_infinity():
    F12 = b.FQ12
    import jax.numpy as jnp

    G = b.G1.generator((1,))
    Ginf = sw.AffinePoints(G.x, G.y, jnp.ones((1,), dtype=bool))
    Q = b.G2.generator((1,))
    gt = bls12.pairing_each(b.PAIRING, Ginf, Q)
    assert np.asarray(F12.eq(gt, F12.one((1,)))).all()
