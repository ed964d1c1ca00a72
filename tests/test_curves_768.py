"""768-bit-class curve instantiations: bls12_377, mnt4_753, mnt6_753,
bw6_767 — host-int oracle validation (generator on curve, prime-order
subgroup, twist sanity), plus slow-marked device pairing checks.

Reference: curves/{bls12_377,mnt4_753,mnt6_753,bw6_767}/src/curves/tests
(test_group!/test_pairing! instantiations)."""

import numpy as np
import pytest

from zkarray.curves import bls12_377, bw6_767, cp6_782, mnt4_753, mnt6_753


def _host_affine_mul(host, P, k, a_coeff):
    """k·P on y² = x³ + a·x + b over a host field ops object. Jacobian
    double-and-add (no inversions — 753-bit host affine would be slow);
    returns None iff the result is the point at infinity."""
    m, s, ad, z0 = host.mul, host.sub, host.add, host.zero()

    def dbl(Pj):
        if Pj is None:
            return None
        X, Y, Z = Pj
        XX = m(X, X)
        YY = m(Y, Y)
        YYYY = m(YY, YY)
        ZZ = m(Z, Z)
        t = m(ad(X, YY), ad(X, YY))
        S = ad(s(s(t, XX), YYYY), s(s(t, XX), YYYY))
        M = ad(ad(ad(XX, XX), XX), m(a_coeff, m(ZZ, ZZ)))
        X3 = s(m(M, M), ad(S, S))
        e8 = ad(ad(YYYY, YYYY), ad(YYYY, YYYY))
        Y3 = s(m(M, s(S, X3)), ad(e8, e8))
        Z3 = s(s(m(ad(Y, Z), ad(Y, Z)), YY), ZZ)
        return (X3, Y3, Z3)

    def madd(Pj, Q):
        # mixed add Pj (jacobian) + Q (affine)
        if Pj is None:
            return (Q[0], Q[1], host.one())
        X1, Y1, Z1 = Pj
        x2, y2 = Q
        ZZ1 = m(Z1, Z1)
        U2 = m(x2, ZZ1)
        S2 = m(y2, m(ZZ1, Z1))
        if host.eq(U2, X1):
            if host.eq(S2, Y1):
                return dbl(Pj)
            return None
        H = s(U2, X1)
        HH = m(H, H)
        I = ad(ad(HH, HH), ad(HH, HH))
        J = m(H, I)
        r = ad(s(S2, Y1), s(S2, Y1))
        V = m(X1, I)
        X3 = s(s(m(r, r), J), ad(V, V))
        Y3 = s(m(r, s(V, X3)), ad(m(Y1, J), m(Y1, J)))
        Z3 = s(s(m(ad(Z1, H), ad(Z1, H)), ZZ1), HH)
        return (X3, Y3, Z3)

    R = None
    for bit in bin(k)[2:]:
        R = dbl(R)
        if bit == "1":
            R = madd(R, P)
    if R is None or host.eq(R[2], z0):
        return None
    return R


def _check_g1(mod):
    G = mod.G1
    p = G.base.modulus
    assert (G.gen_y**2 - (G.gen_x**3 + G.a_int * G.gen_x + G.b_int)) % p == 0
    # prime order: r·G = ∞ and (r-1)·G = -G
    from zkarray.ff.tower_host import HostPrime

    host = HostPrime(p)
    P = (G.gen_x, G.gen_y)
    assert _host_affine_mul(host, P, mod.FR.modulus, G.a_int % p) is None


def _check_g2(mod):
    G2 = mod.G2
    ops = G2.ops
    host = ops.host
    # host ext elements are plain nested int tuples — the config tuples
    x, y, a, b = G2.gen_x, G2.gen_y, G2.a_host, G2.b_host
    lhs = host.mul(y, y)
    rhs = host.add(host.add(host.mul(host.mul(x, x), x), host.mul(a, x)), b)
    assert host.eq(lhs, rhs), f"{mod.__name__} G2 generator not on curve"
    # r·G2 = ∞
    assert _host_affine_mul(host, (x, y), mod.FR.modulus, a) is None


@pytest.mark.parametrize("mod", [bls12_377, mnt4_753, mnt6_753, cp6_782])
def test_g1_g2_generators(mod):
    _check_g1(mod)
    _check_g2(mod)


def test_bw6_767_generators():
    _check_g1(bw6_767)
    # bw6 G2 lives over the same prime field
    G2 = bw6_767.G2
    p = G2.base.modulus
    assert (G2.gen_y**2 - (G2.gen_x**3 + G2.b_int)) % p == 0
    from zkarray.ff.tower_host import HostPrime

    host = HostPrime(p)
    assert (
        _host_affine_mul(host, (G2.gen_x, G2.gen_y), bw6_767.FR.modulus, 0)
        is None
    )


@pytest.mark.slow
def test_mnt4_753_pairing_bilinear():
    from zkarray.ec.pairing import mnt as mnt_mod
    from zkarray.ec import sw, sw_ext
    import jax.numpy as jnp

    b = mnt4_753
    F4 = b.FQ4
    G = b.G1.generator((1,))
    G1j = sw.from_affine(b.G1, G)
    G_dbl = sw.to_affine(b.G1, sw.jac_double(b.G1, G1j))
    H = b.G2.generator((1,))
    H2 = sw_ext.to_affine(
        b.G2, sw_ext.double(b.G2, sw_ext.from_affine(b.G2, H))
    )
    P = sw.AffinePoints(
        jnp.concatenate([G_dbl.x, G.x], axis=1),
        jnp.concatenate([G_dbl.y, G.y], axis=1),
        jnp.concatenate([G_dbl.inf, G.inf]),
    )
    Q = sw_ext.ExtAffine(
        jnp.concatenate([H.x, H2.x], axis=-1),
        jnp.concatenate([H.y, H2.y], axis=-1),
        jnp.concatenate([H.inf, H2.inf]),
    )
    gts = mnt_mod.pairing_each(b.PAIRING, P, Q)
    assert np.asarray(F4.eq(gts[..., 0:1], gts[..., 1:2])).all()


@pytest.mark.slow
def test_bls12_377_pairing_devices():
    # covered un-marked in test_pairing_bls377.py; kept here for the
    # 768-bit suite completeness run
    from tests.test_pairing_bls377 import test_pairing_bilinear_377

    test_pairing_bilinear_377()


@pytest.mark.slow
def test_cp6_782_pairing_bilinear():
    """e(2G, H) == e(G, H)^2 on CP6-782 (device Miller loop + final exp,
    host-precomputed ladder)."""
    import jax.numpy as jnp
    from zkarray.ec import sw
    from zkarray.ec.pairing import cp6

    b = cp6_782
    F6 = b.FQ6
    G = b.G1.generator((1,))
    G_dbl = sw.to_affine(b.G1, sw.jac_double(b.G1, sw.from_affine(b.G1, G)))
    P = sw.AffinePoints(
        jnp.concatenate([G_dbl.x, G.x], axis=1),
        jnp.concatenate([G_dbl.y, G.y], axis=1),
        jnp.concatenate([G_dbl.inf, G.inf]),
    )
    q = (b.G2.gen_x, b.G2.gen_y)
    gts = cp6.pairing_each(b.PAIRING, P, [q, q])
    e2 = gts[..., 0:1]
    e1 = gts[..., 1:2]
    assert np.asarray(F6.eq(e2, F6.sqr(e1))).all()
    assert not np.asarray(F6.eq(e1, F6.one((1,)))).all()


@pytest.mark.slow
def test_mnt6_753_pairing_bilinear():
    """e(2G, H) == e(G, 2H) on MNT6-753 (reference test_pairing! semantics,
    test-templates/src/pairing.rs:2-67) — first actual Miller-loop exercise
    of the 753-bit MNT6 engine parameters."""
    from zkarray.ec.pairing import mnt as mnt_mod
    from zkarray.ec import sw, sw_ext
    import jax.numpy as jnp

    b = mnt6_753
    F6 = b.FQ6
    G = b.G1.generator((1,))
    G1j = sw.from_affine(b.G1, G)
    G_dbl = sw.to_affine(b.G1, sw.jac_double(b.G1, G1j))
    H = b.G2.generator((1,))
    H2 = sw_ext.to_affine(
        b.G2, sw_ext.double(b.G2, sw_ext.from_affine(b.G2, H))
    )
    P = sw.AffinePoints(
        jnp.concatenate([G_dbl.x, G.x], axis=1),
        jnp.concatenate([G_dbl.y, G.y], axis=1),
        jnp.concatenate([G_dbl.inf, G.inf]),
    )
    Q = sw_ext.ExtAffine(
        jnp.concatenate([H.x, H2.x], axis=-1),
        jnp.concatenate([H.y, H2.y], axis=-1),
        jnp.concatenate([H.inf, H2.inf]),
    )
    gts = mnt_mod.pairing_each(b.PAIRING, P, Q)
    assert np.asarray(F6.eq(gts[..., 0:1], gts[..., 1:2])).all()
    # non-degeneracy: e(G, H) != 1
    one = F6.one((1,))
    assert not np.asarray(F6.eq(gts[..., 0:1], one)).all()


@pytest.mark.slow
def test_bw6_767_pairing_bilinear():
    """e(2G, H) == e(G, 2H) on BW6-767 (G2 over the base prime field)."""
    from zkarray.ec.pairing import bw6 as bw6_mod
    from zkarray.ec import sw
    import jax.numpy as jnp
    import os

    # The L=48 Miller/final-exp executables hit the XLA:CPU serialize
    # fault during persistent-cache writes (segfaulted this file's slow
    # run in round 4); shield every compile this test triggers.
    os.environ["ZKARRAY_CACHE_WRITE_DENY"] = (
        "miller,g2_prepare,final_exp,pairing,exp_"
    )

    b = bw6_767
    F6 = b.FQ6
    G = b.G1.generator((1,))
    G_dbl = sw.to_affine(b.G1, sw.jac_double(b.G1, sw.from_affine(b.G1, G)))
    H = b.G2.generator((1,))
    H2 = sw.to_affine(b.G2, sw.jac_double(b.G2, sw.from_affine(b.G2, H)))
    P = sw.AffinePoints(
        jnp.concatenate([G_dbl.x, G.x], axis=1),
        jnp.concatenate([G_dbl.y, G.y], axis=1),
        jnp.concatenate([G_dbl.inf, G.inf]),
    )
    Q = sw.AffinePoints(
        jnp.concatenate([H.x, H2.x], axis=1),
        jnp.concatenate([H.y, H2.y], axis=1),
        jnp.concatenate([H.inf, H2.inf]),
    )
    gts = bw6_mod.pairing_each(b.PAIRING, P, Q)
    assert np.asarray(F6.eq(gts[..., 0:1], gts[..., 1:2])).all()
    one = F6.one((1,))
    assert not np.asarray(F6.eq(gts[..., 0:1], one)).all()
