"""Serialization round-trip + wire-format tests.

Mirrors the reference's serialization test matrix (test-templates/src/
fields.rs:84-140): byte sizes, LE layout, flag packing in top bits,
out-of-range rejection.
"""

import random

import numpy as np

from zkarray.curves import bls12_381, bn254
from zkarray.ff import fp
from zkarray.serialize import canonical as ser


def test_byte_sizes():
    # arkworks: BLS12-381 Fq = 48 bytes, Fr = 32 bytes; +2 flag bits still 48
    assert ser.field_byte_size(bls12_381.FQ) == 48
    assert ser.field_byte_size(bls12_381.FQ, 2) == 48
    assert ser.field_byte_size(bls12_381.FR) == 32
    assert ser.field_byte_size(bn254.FR) == 32
    # 255-bit Fr + 2 flag bits overflows into a new byte? 255+2=257 → 33
    assert ser.field_byte_size(bls12_381.FR, 2) == 33


def test_roundtrip_le_layout():
    spec = bn254.FR
    p = spec.modulus
    rng = random.Random(0)
    xs = [0, 1, p - 1] + [rng.randrange(p) for _ in range(13)]
    a = fp.from_ints(spec, xs)
    data = ser.serialize_fp(spec, a)
    assert data.shape == (16, 32)
    # little-endian check against int.to_bytes
    for i, x in enumerate(xs):
        assert bytes(data[i]) == x.to_bytes(32, "little")
    back, flags, valid = ser.deserialize_fp(spec, data)
    assert valid.all() and (flags == 0).all()
    assert fp.to_ints(spec, back) == xs


def test_flags_packing():
    spec = bls12_381.FQ
    xs = [5, 7, 11]
    a = fp.from_ints(spec, xs)
    flags = np.array(
        [ser.SW_FLAG_INFINITY, ser.SW_FLAG_NEGATIVE, 0], dtype=np.uint8
    )
    data = ser.serialize_fp(spec, a, flag_bits=2, flags=flags)
    assert data[0, -1] & 0xC0 == 0x40
    assert data[1, -1] & 0xC0 == 0x80
    assert data[2, -1] & 0xC0 == 0
    back, fl, valid = ser.deserialize_fp(spec, data, flag_bits=2)
    assert valid.all()
    assert list(fl) == [0x40, 0x80, 0]
    assert fp.to_ints(spec, back) == xs


def test_reject_noncanonical():
    spec = bn254.FR
    p = spec.modulus
    bad = np.frombuffer(p.to_bytes(32, "little"), dtype=np.uint8)[None]
    good = np.frombuffer((p - 1).to_bytes(32, "little"), dtype=np.uint8)[None]
    _, _, v1 = ser.deserialize_fp(spec, bad)
    _, _, v2 = ser.deserialize_fp(spec, good)
    assert not v1[0] and v2[0]
