"""GLV scalar mul + fixed-base batch mul vs oracle (reference: test suites
glv.rs / scalar_mul tests in test-templates)."""

import random

import numpy as np

from ec_oracle import ec_mul
from zkarray.curves import bls12_381 as b381
from zkarray.ec import fixed_base, glv, sw
from zkarray.ff import fp


def test_glv_decomposition():
    g = glv.bls12_381_g1_glv()
    r = b381.FR.modulus
    rng = random.Random(0)
    for _ in range(10):
        k = rng.randrange(r)
        k1, k2 = g.decompose(k)
        assert (k1 + g.lam * k2 - k) % r == 0
        assert abs(k1) < 1 << 130 and abs(k2) < 1 << 130


def test_glv_mul_vs_oracle():
    g = glv.bls12_381_g1_glv()
    curve = b381.G1
    a, mod = curve.a_int, curve.base.modulus
    gen = (curve.gen_x, curve.gen_y)
    rng = random.Random(1)
    pts = [ec_mul(gen, k, a, mod) for k in (1, 2, 7)]
    ks = [0, 1, rng.randrange(curve.scalar.modulus)]
    A = curve.affine_from_ints(pts)
    res = sw.to_affine(curve, glv.glv_mul(g, A, ks))
    assert curve.affine_to_ints(res) == [ec_mul(p, k, a, mod) for p, k in zip(pts, ks)]


def test_fixed_base_batch_mul():
    curve = b381.G1
    a, mod = curve.a_int, curve.base.modulus
    gen = (curve.gen_x, curve.gen_y)
    tbl = fixed_base.FixedBaseTable(curve, gen, window=13)
    rng = random.Random(2)
    ks = [0, 1, 2, rng.randrange(curve.scalar.modulus), curve.scalar.modulus - 1]
    s = fp.from_ints(curve.scalar, ks, mont=False)
    res = sw.to_affine(curve, tbl.batch_mul(s))
    assert curve.affine_to_ints(res) == [ec_mul(gen, k, a, mod) for k in ks]


def test_glv_parameter_sets_algebraic():
    """Every shipped GLV spec satisfies β³=1 (β≠1) in Fq and λ²+λ+1=0 in Fr,
    and decompose(k) returns k1+λk2 ≡ k with |k1|,|k2| ~ sqrt(r)
    (reference curves/*/g1.rs GLVConfig consts + test-templates glv.rs)."""
    from zkarray.ec import glv as glv_mod

    specs = [
        glv_mod.bls12_381_g1_glv(),
        glv_mod.bn254_g1_glv(),
        glv_mod.bls12_377_g1_glv(),
        glv_mod.bw6_761_g1_glv(),
        glv_mod.pallas_glv(),
        glv_mod.vesta_glv(),
    ]
    rng = np.random.default_rng(11)
    for g in specs:
        q = g.curve.base.modulus
        r = g.curve.scalar.modulus
        beta, lam = g.endo_coeff, g.lam
        assert pow(beta, 3, q) == 1 and beta != 1, g.curve.name
        assert (lam * lam + lam + 1) % r == 0, g.curve.name
        for _ in range(4):
            k = int(rng.integers(1, 1 << 62)) * int(rng.integers(1, 1 << 62))
            k1, k2 = g.decompose(k % r)
            assert (k1 + lam * k2 - (k % r)) % r == 0, g.curve.name
            assert max(abs(k1), abs(k2)) < 1 << ((r.bit_length() // 2) + 3), g.curve.name


def test_g2_glv_mul_vs_ladder():
    """G2 GLV (ext-field endomorphism) vs plain scalar mul — reference
    implements GLVConfig for G2 as well (curves/bls12_381/src/curves/
    g2.rs:193-222)."""
    import numpy as np
    from zkarray.curves import bls12_381 as b381
    from zkarray.ec import glv as glv_mod
    from zkarray.ec import sw_ext

    g = glv_mod.bls12_381_g2_glv()
    F2 = b381.FQ2
    H = b381.G2.generator((1,))
    ks = [1, 2, 12345, b381.G2.scalar.modulus - 3]
    import jax.numpy as jnp

    A = sw_ext.ExtAffine(
        jnp.concatenate([H.x] * len(ks), axis=-1),
        jnp.concatenate([H.y] * len(ks), axis=-1),
        jnp.concatenate([H.inf] * len(ks)),
    )
    got = sw_ext.to_affine(b381.G2, glv_mod.glv_mul_ext(g, A, ks))
    gx, gy = F2.to_ints(got.x), F2.to_ints(got.y)
    for i, k in enumerate(ks):
        want = sw_ext.to_affine(
            b381.G2,
            sw_ext.scalar_mul_const(b381.G2, sw_ext.from_affine(b381.G2, H), k),
        )
        wx, wy = F2.to_ints(want.x), F2.to_ints(want.y)
        assert (gx[0][i], gx[1][i]) == (wx[0][0], wx[1][0]), k
        assert (gy[0][i], gy[1][i]) == (wy[0][0], wy[1][0]), k


def test_g2_glv_endo_eigenvalue():
    """φ(H) == λ·H on G2 (the defining GLV property)."""
    from zkarray.curves import bls12_381 as b381
    from zkarray.ec import glv as glv_mod
    from zkarray.ec import sw_ext
    import numpy as np

    g = glv_mod.bls12_381_g2_glv()
    F2 = b381.FQ2
    H = b381.G2.generator((1,))
    phiH = glv_mod.endomorphism_ext(g, H)
    lamH = sw_ext.to_affine(
        b381.G2,
        sw_ext.scalar_mul_const(b381.G2, sw_ext.from_affine(b381.G2, H), g.lam),
    )
    assert F2.to_ints(phiH.x) == F2.to_ints(lamH.x)
    assert F2.to_ints(phiH.y) == F2.to_ints(lamH.y)
