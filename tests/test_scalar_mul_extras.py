"""wNAF context, streaming MSM, magnitude-partitioned MSM, serde wrappers,
to_field_vec — coverage for the previously-untested surface (reference:
ec/src/scalar_mul/wnaf.rs, .../variable_base/stream_pippenger.rs,
.../variable_base/mod.rs:242-434, serialize/src/serde.rs,
ff/src/to_field_vec.rs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from zkarray.curves import bn254
from zkarray.ec import msm as msm_mod
from zkarray.ec import stream_msm, sw, wnaf
from zkarray.ff import fp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ec_oracle import ec_mul, ec_add

CURVE = bn254.G1
A_INT, MOD = CURVE.a_int, CURVE.base.modulus
GEN = (CURVE.gen_x, CURVE.gen_y)


def _oracle_msm(pts, ks):
    acc = None
    for pt, k in zip(pts, ks):
        term = ec_mul(pt, k, A_INT, MOD)
        acc = term if acc is None else ec_add(acc, term, A_INT, MOD)
    return acc


def test_wnaf_context_matches_oracle():
    ctx = wnaf.WnafContext(CURVE, GEN, window=4)
    ks = [1, 2, 5, 1 << 20, 12345678901234567]
    got = sw.to_affine(CURVE, ctx.mul(ks))
    want = [ec_mul(GEN, k, A_INT, MOD) for k in ks]
    assert CURVE.affine_to_ints(got) == want


def test_stream_msm_chunked_and_hashmap():
    rng = np.random.default_rng(3)
    n = 24
    pts = [ec_mul(GEN, int(k), A_INT, MOD) for k in rng.integers(1, 1 << 20, n)]
    ks = [int(k) for k in rng.integers(1, 1 << 30, n)]
    want = _oracle_msm(pts, ks)

    # ChunkedPippenger with a small buffer → multiple flushes
    cp = stream_msm.ChunkedPippenger(CURVE, chunk_size=8, c=4)
    for pt, k in zip(pts, ks):
        cp.add(pt, k)
    got = sw.xyzz_to_affine(
        CURVE, sw.XYZZPoints(*(v[..., None] for v in cp.finalize()))
    )
    assert CURVE.affine_to_ints(got)[0] == want

    # HashMapPippenger coalesces repeated bases
    hp = stream_msm.HashMapPippenger(CURVE, c=4)
    for pt, k in zip(pts + pts, ks + ks):  # every base twice
        hp.add(pt, k)
    got2 = sw.xyzz_to_affine(
        CURVE, sw.XYZZPoints(*(v[..., None] for v in hp.finalize()))
    )
    want2 = _oracle_msm(pts, [2 * k for k in ks])
    assert CURVE.affine_to_ints(got2)[0] == want2


def test_msm_mixed_magnitude_classes():
    """Half tiny scalars, some mid-width, some full — per-class dispatch
    must agree with the oracle (reference msm.rs mixed-magnitude test)."""
    rng = np.random.default_rng(4)
    n = 32
    pts = [ec_mul(GEN, int(k), A_INT, MOD) for k in rng.integers(1, 1 << 20, n)]
    ks = []
    for i in range(n):
        cls = i % 4
        if cls == 0:
            ks.append(1)
        elif cls == 1:
            ks.append(int(rng.integers(2, 1 << 8)))
        elif cls == 2:
            ks.append(int(rng.integers(1 << 8, 1 << 30)))
        else:
            ks.append(int(rng.integers(1 << 40, 1 << 62)))
    A = CURVE.affine_from_ints(pts)
    s = fp.from_ints(CURVE.scalar, ks, mont=False)
    res = msm_mod.msm_mixed(CURVE, A, s, c=4)
    got = sw.xyzz_to_affine(CURVE, sw.XYZZPoints(*(v[..., None] for v in res)))
    assert CURVE.affine_to_ints(got)[0] == _oracle_msm(pts, ks)


def test_msm_max_bits_specialization():
    """max_scalar_bits shrinks W without changing the result."""
    rng = np.random.default_rng(5)
    n = 16
    pts = [ec_mul(GEN, int(k), A_INT, MOD) for k in rng.integers(1, 1 << 20, n)]
    ks = [int(k) for k in rng.integers(1, 1 << 16, n)]
    A = CURVE.affine_from_ints(pts)
    s = fp.from_ints(CURVE.scalar, ks, mont=False)
    r1 = msm_mod.msm(CURVE, A, s, 4)
    r2 = msm_mod.msm(CURVE, A, s, 4, 16)
    a1 = sw.xyzz_to_affine(CURVE, sw.XYZZPoints(*(v[..., None] for v in r1)))
    a2 = sw.xyzz_to_affine(CURVE, sw.XYZZPoints(*(v[..., None] for v in r2)))
    assert CURVE.affine_to_ints(a1) == CURVE.affine_to_ints(a2)
    assert CURVE.affine_to_ints(a1)[0] == _oracle_msm(pts, ks)


def test_serde_wrappers_and_hash_ext():
    from zkarray.serialize import wrappers
    from zkarray.serialize.canonical import serialize_fp

    a = fp.from_ints(bn254.FR, [42, 7])
    data = serialize_fp(bn254.FR, a).tobytes()
    h1 = wrappers.hash_canonical(lambda: data)
    h2 = wrappers.hash_canonical(lambda: data)
    assert h1 == h2 and len(h1) == 32
    modes = [
        wrappers.COMPRESSED_CHECKED,
        wrappers.COMPRESSED_UNCHECKED,
        wrappers.UNCOMPRESSED_CHECKED,
        wrappers.UNCOMPRESSED_UNCHECKED,
    ]
    assert len({(m.compress, m.validate) for m in modes}) == 4


def test_to_field_vec():
    from zkarray.ff import to_field_vec as tfv

    spec = bn254.FR
    vec = tfv.bytes_to_field_vec(spec, b"hello world, this is a test")
    per = (spec.bits - 1) // 8
    assert vec.shape[1] == (28 + per - 1) // per
    ints = fp.to_ints(spec, vec)
    assert ints[0] == int.from_bytes(b"hello world, this is a test"[:per], "little")

    a = fp.from_ints(spec, [9])
    assert tfv.field_to_field_vec(spec, a) == [a]

    G = CURVE.generator((1,))
    xs, ys = tfv.affine_to_field_vec(CURVE, G)
    assert fp.to_ints(CURVE.base, xs) == [CURVE.gen_x]
