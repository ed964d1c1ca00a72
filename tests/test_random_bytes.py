"""from_random_bytes semantics vs a Python-int oracle of the reference
(ff/src/fields/models/fp/mod.rs:252-296, ec SW affine.rs:264-277,
TE affine.rs:177-180)."""

import numpy as np

from ec_oracle import ec_mul
from zkarray.curves import bls12_381 as b381, bn254
from zkarray.curves import ed_on_bls12_381 as jj
from zkarray.ff import fp
from zkarray.serialize import random_bytes as rb
from zkarray.serialize.canonical import field_byte_size


def _oracle_field(spec, data: bytes, flag_bits: int):
    """Python-int mirror of Fp::from_random_bytes_with_flags."""
    n64 = (spec.bits + 63) // 64
    buf = bytearray(8 * n64)
    buf[: min(len(data), len(buf))] = data[: len(buf)]
    flags = 0
    if flag_bits:
        loc = field_byte_size(spec, flag_bits) - 1
        if loc < len(data):
            flags = data[loc] & ((0xFF << (8 - flag_bits)) & 0xFF)
    v = int.from_bytes(bytes(buf), "little") & ((1 << spec.bits) - 1)
    ok = v < spec.modulus
    return (v if ok else None), flags


def test_field_from_random_bytes_oracle():
    spec = b381.FQ
    rng = np.random.default_rng(7)
    nb = field_byte_size(spec, 2)
    data = rng.integers(0, 256, size=(64, nb), dtype=np.uint8)
    # force some candidates >= p by saturating top bytes
    data[:8, :-1] = 0xFF
    arr, flags, ok = rb.field_from_random_bytes(spec, data, flag_bits=2)
    vals = fp.to_ints(spec, arr)
    for i in range(64):
        want_v, want_f = _oracle_field(spec, bytes(data[i]), 2)
        assert flags[i] == want_f
        assert ok[i] == (want_v is not None)
        if want_v is not None:
            assert vals[i] == want_v


def test_field_from_random_bytes_short_and_long_input():
    spec = bn254.FR
    rng = np.random.default_rng(8)
    nb = field_byte_size(spec, 0)
    for k in (nb - 5, nb, nb + 7):
        data = rng.integers(0, 256, size=(8, k), dtype=np.uint8)
        arr, flags, ok = rb.field_from_random_bytes(spec, data)
        vals = fp.to_ints(spec, arr)
        for i in range(8):
            want_v, _ = _oracle_field(spec, bytes(data[i]), 0)
            assert ok[i] == (want_v is not None)
            if want_v is not None:
                assert vals[i] == want_v


def test_sw_from_random_bytes():
    curve = bn254.G1
    f = curve.base
    p = f.modulus
    rng = np.random.default_rng(9)
    nb = field_byte_size(f, 2)
    data = rng.integers(0, 256, size=(96, nb), dtype=np.uint8)
    # a few crafted rows: infinity encoding (zero + inf flag), both-flag junk
    data[0] = 0
    data[0, -1] = 0x40
    data[1] = 0
    data[1, -1] = 0xC0  # both flags -> invalid
    pts, ok = rb.sw_from_random_bytes(curve, data)
    assert bool(ok[0]) and bool(np.asarray(pts.inf)[0])
    assert not ok[1]
    xs = fp.to_ints(f, pts.x)
    ys = fp.to_ints(f, pts.y)
    n_valid = 0
    for i in range(2, 96):
        want_x, flags = _oracle_field(f, bytes(data[i]), 2)
        if want_x is None or flags == 0xC0:
            assert not ok[i]
            continue
        if flags & 0x40:
            assert bool(ok[i]) == (want_x == 0)
            continue
        rhs = (pow(want_x, 3, p) + curve.a_int * want_x + curve.b_int) % p
        if pow(rhs, (p - 1) // 2, p) not in (0, 1 % p):
            assert not ok[i]
            continue
        assert ok[i]
        n_valid += 1
        assert xs[i] == want_x
        y = ys[i]
        assert (y * y - rhs) % p == 0
        # greatest root iff negative-flag CLEAR (reference quirk)
        if flags & 0x80:
            assert y <= p - y
        else:
            assert y >= p - y
        # on curve, no subgroup requirement (get_point_from_x_unchecked)
    assert n_valid >= 10  # ~half of x candidates are squares


def test_te_from_random_bytes():
    curve = jj.EDWARDS
    f = curve.base
    p = f.modulus
    rng = np.random.default_rng(10)
    nb = field_byte_size(f, 1)
    data = rng.integers(0, 256, size=(64, nb), dtype=np.uint8)
    pts, ok = rb.te_from_random_bytes(curve, data)
    xs = fp.to_ints(f, pts.x)
    ys = fp.to_ints(f, pts.y)
    n_valid = 0
    for i in range(64):
        want_y, flags = _oracle_field(f, bytes(data[i]), 1)
        if want_y is None:
            assert not ok[i]
            continue
        num = (want_y * want_y - 1) % p
        den = (curve.d_int * want_y * want_y - curve.a_int) % p
        if den == 0:
            continue
        x2 = num * pow(den, -1, p) % p
        if pow(x2, (p - 1) // 2, p) not in (0, 1 % p):
            assert not ok[i]
            continue
        assert ok[i]
        n_valid += 1
        assert ys[i] == want_y
        x = xs[i]
        assert (x * x - x2) % p == 0
        # greater root iff the negative flag IS set (TEFlags::is_negative)
        if flags & 0x80:
            assert x >= p - x
        else:
            assert x <= p - x
    assert n_valid >= 10
