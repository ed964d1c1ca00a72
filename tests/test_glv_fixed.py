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


def _host_g2_mul(xy, k, p):
    """Host Fq2 affine double-and-add on E2: y² = x³ + 4(u+1) (a = 0);
    an independent oracle that replaces the per-scalar device ladders this
    file used to compile (5 full-width ext-curve scan compiles ≈ minutes
    of this file's cold cost)."""

    def fmul(a, b):
        return ((a[0] * b[0] - a[1] * b[1]) % p, (a[0] * b[1] + a[1] * b[0]) % p)

    def finv(a):
        n = pow(a[0] * a[0] + a[1] * a[1], -1, p)
        return ((a[0] * n) % p, (-a[1] * n) % p)

    def fsub(a, b):
        return ((a[0] - b[0]) % p, (a[1] - b[1]) % p)

    def padd(P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        if P[0] == Q[0]:
            if (P[1][0] + Q[1][0]) % p == 0 and (P[1][1] + Q[1][1]) % p == 0:
                return None
            xx = fmul(P[0], P[0])
            lam = fmul((3 * xx[0] % p, 3 * xx[1] % p), finv((2 * P[1][0] % p, 2 * P[1][1] % p)))
        else:
            lam = fmul(fsub(Q[1], P[1]), finv(fsub(Q[0], P[0])))
        x3 = fsub(fsub(fmul(lam, lam), P[0]), Q[0])
        y3 = fsub(fmul(lam, fsub(P[0], x3)), P[1])
        return (x3, y3)

    acc = None
    add = xy
    while k:
        if k & 1:
            acc = padd(acc, add)
        add = padd(add, add)
        k >>= 1
    return acc


def test_g2_glv_mul_vs_host_oracle():
    """G2 GLV (ext-field endomorphism) vs a host Fq2 ladder — reference
    implements GLVConfig for G2 as well (curves/bls12_381/src/curves/
    g2.rs:193-222)."""
    from zkarray.curves import bls12_381 as b381
    from zkarray.ec import glv as glv_mod
    from zkarray.ec import sw_ext

    g = glv_mod.bls12_381_g2_glv()
    F2 = b381.FQ2
    p = b381.FQ.modulus
    H = b381.G2.generator((1,))
    hx = (b381.G2.gen_x[0], b381.G2.gen_x[1])
    hy = (b381.G2.gen_y[0], b381.G2.gen_y[1])
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
        wx, wy = _host_g2_mul((hx, hy), k, p)
        assert (gx[0][i], gx[1][i]) == wx, k
        assert (gy[0][i], gy[1][i]) == wy, k


def test_g2_glv_endo_eigenvalue():
    """φ(H) == λ·H on G2 (the defining GLV property); λ·H via the host
    Fq2 ladder."""
    from zkarray.curves import bls12_381 as b381
    from zkarray.ec import glv as glv_mod

    g = glv_mod.bls12_381_g2_glv()
    F2 = b381.FQ2
    p = b381.FQ.modulus
    H = b381.G2.generator((1,))
    hx = (b381.G2.gen_x[0], b381.G2.gen_x[1])
    hy = (b381.G2.gen_y[0], b381.G2.gen_y[1])
    phiH = glv_mod.endomorphism_ext(g, H)
    wx, wy = _host_g2_mul((hx, hy), g.lam, p)
    px, py = F2.to_ints(phiH.x), F2.to_ints(phiH.y)
    assert (px[0][0], px[1][0]) == wx
    assert (py[0][0], py[1][0]) == wy
