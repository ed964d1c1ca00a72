"""Point serialization tests: arkworks canonical SW/TE formats (round trips +
edge cases) and byte-exact zcash BLS12-381 vectors (the reference's
curves/bls12_381/src/curves/tests/mod.rs:71+ checks the same .dat files)."""

import os
import random

import numpy as np

from ec_oracle import ec_add, ec_mul
from zkarray.curves import bls12_381 as b381
from zkarray.curves import bn254, bls12_381_zcash as zc
from zkarray.curves import ed_on_bls12_381 as jj
from zkarray.ec import point_serde as ps
from zkarray.ec import sw

VEC_DIR = os.path.join(os.path.dirname(__file__), "vectors")


def test_sw_roundtrip_bn254():
    curve = bn254.G1
    g = (curve.gen_x, curve.gen_y)
    rng = random.Random(0)
    pts = [None] + [
        ec_mul(g, rng.randrange(1, curve.scalar.modulus), curve.a_int, curve.base.modulus)
        for _ in range(7)
    ]
    A = curve.affine_from_ints(pts)
    for compress in (True, False):
        data = ps.serialize_sw(curve, A, compress)
        back, ok = ps.deserialize_sw(curve, data, compress)
        assert ok.all()
        assert curve.affine_to_ints(back) == pts


def test_te_roundtrip():
    curve = jj.EDWARDS
    from test_te import te_mul

    g = (curve.gen_x, curve.gen_y)
    pts = [(0, 1)] + [te_mul(g, k) for k in (1, 2, 5, 77)]
    A = curve.affine_from_ints(pts)
    for compress in (True, False):
        data = ps.serialize_te(curve, A, compress)
        back, ok = ps.deserialize_te(curve, data, compress)
        assert ok.all()
        assert curve.affine_to_ints(back) == pts


import functools


@functools.lru_cache(maxsize=None)
def _first_k_multiples(k):
    a, mod = b381.G1.a_int, b381.G1.base.modulus
    g = (b381.G1.gen_x, b381.G1.gen_y)
    pts = [None]
    cur = None
    for _ in range(k - 1):
        cur = ec_add(cur, g, a, mod)
        pts.append(cur)
    return tuple(pts)


def test_zcash_g1_compressed_vectors():
    # ALL 1000 vectors, matching the reference's full-file sweep
    # (curves/bls12_381/src/curves/tests/mod.rs:71+); ops are batched so the
    # whole file is one compiled call.
    k = 1000
    raw = open(os.path.join(VEC_DIR, "g1_compressed_valid_test_vectors.dat"), "rb").read()
    want = np.frombuffer(raw, dtype=np.uint8).reshape(k, 48)
    pts = list(_first_k_multiples(k))
    A = b381.G1.affine_from_ints(pts)
    got = zc.serialize_g1(A, compress=True)
    assert np.array_equal(got, want)
    # deserialize (skip subgroup check for speed; on-curve + sqrt correctness
    # already pins the values — order checked via round-trip equality)
    back, ok = zc.deserialize_g1(want, compress=True, validate=False)
    assert ok.all()
    assert b381.G1.affine_to_ints(back) == pts


def test_zcash_g1_uncompressed_vectors():
    k = 1000
    raw = open(os.path.join(VEC_DIR, "g1_uncompressed_valid_test_vectors.dat"), "rb").read()
    want = np.frombuffer(raw, dtype=np.uint8).reshape(k, 96)
    pts = list(_first_k_multiples(k))
    A = b381.G1.affine_from_ints(pts)
    got = zc.serialize_g1(A, compress=False)
    assert np.array_equal(got, want)
    back, ok = zc.deserialize_g1(want, compress=False, validate=False)
    assert ok.all()
    assert b381.G1.affine_to_ints(back) == pts


# ---------------------------------------------------------------------------
# zcash G2 wire format (x = c1 BE ‖ c0 BE; util.rs:174-256)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _first_k_g2_multiples(k):
    from ec_oracle import ec_add_f

    F = b381.FQ2.host
    g = (b381.G2.gen_x, b381.G2.gen_y)
    a = F.zero()
    pts = [None]  # vectors start at 0·G (tests/mod.rs test_vectors! loop)
    cur = None
    for _ in range(k - 1):
        cur = ec_add_f(F, cur, g, a)
        pts.append(cur)
    return tuple(pts)


def _g2_affine_from_host(pts):
    import jax.numpy as jnp

    F2 = b381.FQ2
    from zkarray.ec import sw_ext

    z = ((0, 0), (0, 0))
    xy = [z if p is None else p for p in pts]
    c0x = [p[0][0] for p in xy]
    c1x = [p[0][1] for p in xy]
    c0y = [p[1][0] for p in xy]
    c1y = [p[1][1] for p in xy]
    return sw_ext.ExtAffine(
        F2.from_ints([c0x, c1x]),
        F2.from_ints([c0y, c1y]),
        jnp.asarray([p is None for p in pts]),
    )


def test_zcash_g2_compressed_vectors():
    k = 1000
    raw = open(os.path.join(VEC_DIR, "g2_compressed_valid_test_vectors.dat"), "rb").read()
    want = np.frombuffer(raw, dtype=np.uint8).reshape(k, 96)
    pts = _first_k_g2_multiples(k)
    A = _g2_affine_from_host(pts)
    got = zc.serialize_g2(A, compress=True)
    assert np.array_equal(got, want)
    back, ok = zc.deserialize_g2(want, compress=True, validate=False)
    assert ok.all()
    assert np.asarray(back.inf).tolist() == [p is None for p in pts]
    F2 = b381.FQ2
    live = [p for p in pts if p is not None]
    sel = [i for i, p in enumerate(pts) if p is not None]
    gx = F2.to_ints(back.x)
    gy = F2.to_ints(back.y)
    assert [gx[0][i] for i in sel] == [p[0][0] for p in live]
    assert [gx[1][i] for i in sel] == [p[0][1] for p in live]
    assert [gy[0][i] for i in sel] == [p[1][0] for p in live]
    assert [gy[1][i] for i in sel] == [p[1][1] for p in live]
    # validated path: all 1000 vectors pass the ψ-endomorphism subgroup check
    _, okv = zc.deserialize_g2(want, compress=True, validate=True)
    assert okv.all()


def test_zcash_g2_uncompressed_vectors():
    k = 1000
    raw = open(os.path.join(VEC_DIR, "g2_uncompressed_valid_test_vectors.dat"), "rb").read()
    want = np.frombuffer(raw, dtype=np.uint8).reshape(k, 192)
    pts = _first_k_g2_multiples(k)
    A = _g2_affine_from_host(pts)
    got = zc.serialize_g2(A, compress=False)
    assert np.array_equal(got, want)
    back, ok = zc.deserialize_g2(want, compress=False, validate=False)
    assert ok.all()
    assert np.asarray(back.inf).tolist() == [p is None for p in pts]
    F2 = b381.FQ2
    live = [p for p in pts if p is not None]
    sel = [i for i, p in enumerate(pts) if p is not None]
    gx = F2.to_ints(back.x)
    assert [gx[0][i] for i in sel] == [p[0][0] for p in live]
    assert [gx[1][i] for i in sel] == [p[0][1] for p in live]


def test_zcash_g2_infinity_and_subgroup():
    import jax.numpy as jnp
    from zkarray.ec import sw_ext

    F2 = b381.FQ2
    inf = sw_ext.ExtAffine(F2.zero((1,)), F2.zero((1,)), jnp.ones(1, dtype=bool))
    b = zc.serialize_g2(inf, compress=True)
    assert b[0, 0] == 0xC0 and not b[0, 1:].any()
    back, ok = zc.deserialize_g2(b, compress=True, validate=True)
    assert ok.all() and bool(back.inf[0])
    # a valid generator encoding passes the ψ subgroup check
    gen = _g2_affine_from_host(_first_k_g2_multiples(1))
    enc = zc.serialize_g2(gen, compress=True)
    _, ok = zc.deserialize_g2(enc, compress=True, validate=True)
    assert ok.all()
    # an on-curve point NOT in the r-subgroup must fail validate:
    # cofactor > 1, so take an x with a solution and check via deserialize
    # of a tweaked encoding: flip the sort bit of the generator encoding —
    # still on curve (other root), still in subgroup iff -G ... so instead
    # use a small search for an on-curve point and assert the checker
    # rejects it unless it is a multiple of G.
    from ec_oracle import ec_mul_f

    Fh = F2.host
    # find an on-curve point by hashing x candidates: x = (i, 0)
    p = F2.spec.modulus
    found = None
    for i in range(2, 40):
        x = (i, 0)
        rhs = Fh.add(Fh.mul(Fh.mul(x, x), x), (4, 4))
        # host sqrt via p^2 exponent check
        e = (p * p - 1) // 2
        if Fh.pow(rhs, e) == Fh.one():
            # get a root on device via quad_sqrt
            from zkarray.ff.towers import quad_sqrt

            arr = F2.from_ints([[rhs[0]], [rhs[1]]])
            root, okr = quad_sqrt(F2, arr)
            assert bool(np.asarray(okr)[0])
            y = tuple(v[0] for v in F2.to_ints(root))
            found = ((i, 0), y)
            break
    assert found is not None
    pt = _g2_affine_from_host([found])
    enc = zc.serialize_g2(pt, compress=True)
    _, okv = zc.deserialize_g2(enc, compress=True, validate=True)
    # overwhelmingly likely not in the r-subgroup (cofactor is ~2^125)
    assert not okv.any()


# ---------------------------------------------------------------------------
# arkworks-default canonical format for extension-field SW points
# (ec/src/models/short_weierstrass/mod.rs:125-193 + quadratic_extension.rs
#  serialize_with_flags: c0 plain LE ++ c1 with SWFlags in the top bits)
# ---------------------------------------------------------------------------

def _host_serialize_g2(pts, nb=48):
    """Oracle: arkworks-canonical compressed bytes built with Python ints."""
    out = []
    for p in pts:
        if p is None:
            buf = bytearray(2 * nb)
            buf[-1] |= 0x40
            out.append(bytes(buf))
            continue
        (x0, x1), (y0, y1) = p
        q = b381.FQ.modulus
        neg = (y1 > q - y1) if y1 != 0 else (y0 > q - y0)
        buf = x0.to_bytes(nb, "little") + x1.to_bytes(nb, "little")
        buf = bytearray(buf)
        if neg:
            buf[-1] |= 0x80
        out.append(bytes(buf))
    return np.frombuffer(b"".join(out), dtype=np.uint8).reshape(len(pts), 2 * nb)


def test_canonical_ext_point_serde_g2():
    import zkarray.ec.point_serde as ps2

    pts = _first_k_g2_multiples(8)
    A = _g2_affine_from_host(pts)
    got = ps2.serialize_sw_ext(b381.G2, A, compress=True)
    want = _host_serialize_g2(pts)
    assert np.array_equal(got, want)
    back, ok = ps2.deserialize_sw_ext(b381.G2, got, compress=True, validate=True)
    assert ok.all()
    assert np.asarray(back.inf).tolist() == [p is None for p in pts]
    F2 = b381.FQ2
    gx, gy = F2.to_ints(back.x), F2.to_ints(back.y)
    for i, p in enumerate(pts):
        if p is None:
            continue
        assert (gx[0][i], gx[1][i]) == p[0] and (gy[0][i], gy[1][i]) == p[1]
    # uncompressed round-trip
    raw = ps2.serialize_sw_ext(b381.G2, A, compress=False)
    back2, ok2 = ps2.deserialize_sw_ext(b381.G2, raw, compress=False, validate=True)
    assert ok2.all()
    assert F2.to_ints(back2.x) == gx and F2.to_ints(back2.y) == gy


def test_canonical_ext_point_serde_fq3_uncompressed():
    """MNT6-298 G2 (cubic extension) uncompressed round-trip."""
    import zkarray.ec.point_serde as ps2
    from zkarray.curves import mnt6_298 as m6
    from zkarray.ec import sw_ext
    import jax.numpy as jnp

    F3 = m6.G2.ops
    H = m6.G2.generator((1,))
    H2 = sw_ext.to_affine(m6.G2, sw_ext.double(m6.G2, sw_ext.from_affine(m6.G2, H)))
    A = sw_ext.ExtAffine(
        jnp.concatenate([H.x, H2.x], axis=-1),
        jnp.concatenate([H.y, H2.y], axis=-1),
        jnp.concatenate([H.inf, H2.inf]),
    )
    raw = ps2.serialize_sw_ext(m6.G2, A, compress=False)
    back, ok = ps2.deserialize_sw_ext(m6.G2, raw, compress=False, validate=True)
    assert ok.all()
    assert F3.to_ints(back.x) == F3.to_ints(A.x)
    assert F3.to_ints(back.y) == F3.to_ints(A.y)
