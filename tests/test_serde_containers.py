"""Container serde wire format + mode wrappers + wnaf + streaming MSM —
coverage for the modules round-1 flagged as untested.

Reference: serialize/src/impls/{int_like,collections,misc,tuples}.rs,
serialize/src/serde.rs, ec/src/scalar_mul/wnaf.rs,
ec/src/scalar_mul/variable_base/stream_pippenger.rs.
"""

import numpy as np
import pytest

from zkarray.serialize import containers as C
from zkarray.serialize import wrappers


def _roundtrip(data: bytes, de):
    r = C.reader(data)
    v = de(r)
    assert r.read() == b"", "trailing bytes"
    return v


def test_primitive_wire_formats():
    # u64 LE length convention and fixed widths
    assert C.ser_u64(3) == b"\x03" + b"\x00" * 7
    assert C.ser_u32(0x01020304) == b"\x04\x03\x02\x01"
    assert C.ser_bool(True) == b"\x01"
    assert C.ser_i16(-2) == b"\xfe\xff"
    assert _roundtrip(C.ser_u64(2**63 + 5), C.de_u64) == 2**63 + 5
    assert _roundtrip(C.ser_i32(-123456), C.de_i32) == -123456
    with pytest.raises(C.SerializationError):
        _roundtrip(b"\x02", C.de_bool)  # bool must be 0/1 (int_like.rs:34-46)


def test_vec_string_option_tuple_map():
    v = [1, 500, 70000]
    data = C.ser_vec(v, C.ser_u32)
    assert data[:8] == C.ser_u64(3)
    assert _roundtrip(data, lambda r: C.de_vec(r, C.de_u32)) == v

    s = "zkarray ✓"
    assert _roundtrip(C.ser_string(s), C.de_string) == s

    assert C.ser_option(None, C.ser_u8) == b"\x00"
    assert _roundtrip(C.ser_option(7, C.ser_u8), lambda r: C.de_option(r, C.de_u8)) == 7
    assert _roundtrip(C.ser_option(None, C.ser_u8), lambda r: C.de_option(r, C.de_u8)) is None

    t = (True, 9, "hi")
    data = C.ser_tuple(t, [C.ser_bool, C.ser_u16, C.ser_string])
    assert _roundtrip(data, lambda r: C.de_tuple(r, [C.de_bool, C.de_u16, C.de_string])) == t

    m = {3: "c", 1: "a"}
    data = C.ser_map(m, C.ser_u32, C.ser_string)
    # sorted key order (BTreeMap iteration)
    assert data[8:12] == C.ser_u32(1)
    assert _roundtrip(data, lambda r: C.de_map(r, C.de_u32, C.de_string)) == m

    big = 2**200 + 12345
    assert _roundtrip(C.ser_biguint(big), C.de_biguint) == big

    arr = [2, 4, 6]
    data = C.ser_array(arr, C.ser_u8)
    assert len(data) == 3  # no length prefix
    assert _roundtrip(data, lambda r: C.de_array(r, C.de_u8, 3)) == arr


def test_nested_containers_with_field_elements():
    """Vec<Option<Fr>> through the canonical field codec."""
    from zkarray.curves import bn254
    from zkarray.ff import fp
    from zkarray.serialize import canonical

    spec = bn254.FR
    vals = [123456789, None, bn254.FR.modulus - 1]

    def ser_fr(x):
        arr = fp.from_ints(spec, [x])
        return bytes(np.asarray(canonical.serialize_fp(spec, arr)).tobytes())

    def de_fr(r):
        nb = canonical.field_byte_size(spec)
        data = np.frombuffer(r.read(nb), dtype=np.uint8).reshape(1, nb)
        arr, _flags, ok = canonical.deserialize_fp(spec, data)
        assert np.asarray(ok).all()
        return fp.to_ints(spec, arr)[0]

    data = C.ser_vec(vals, lambda v: C.ser_option(v, ser_fr))
    got = _roundtrip(data, lambda r: C.de_vec(r, lambda rr: C.de_option(rr, de_fr)))
    assert got == vals


def test_mode_wrappers_and_hash():
    assert wrappers.COMPRESSED_CHECKED.compress and wrappers.COMPRESSED_CHECKED.validate
    assert not wrappers.UNCOMPRESSED_UNCHECKED.compress
    h1 = wrappers.hash_canonical(lambda: b"abc")
    h2 = wrappers.hash_canonical(lambda: b"abc")
    h3 = wrappers.hash_canonical(lambda: b"abd")
    assert h1 == h2 != h3 and len(h1) == 32


def test_wnaf_context():
    from zkarray.curves.zoo import PALLAS
    from zkarray.ec import sw
    from zkarray.ec.wnaf import WnafContext
    from zkarray.ff import fp
    from ec_oracle import ec_mul

    gen = (PALLAS.gen_x, PALLAS.gen_y)
    ctx = WnafContext(PALLAS, gen, window=4)
    ks = [1, 2, 3, 12345, PALLAS.scalar.modulus - 1]
    got = sw.to_affine(PALLAS, ctx.mul(ks))
    exp = [ec_mul(gen, k, PALLAS.a_int, PALLAS.base.modulus) for k in ks]
    E = PALLAS.affine_from_ints(exp)
    assert np.asarray(fp.eq(got.x, E.x)).all()
    assert np.asarray(fp.eq(got.y, E.y)).all()


def test_stream_msm_chunks():
    from zkarray.curves.zoo import PALLAS
    from zkarray.ec import sw, stream_msm
    from zkarray.ff import fp
    from ec_oracle import ec_mul
    import jax.numpy as jnp

    gen = (PALLAS.gen_x, PALLAS.gen_y)
    q = PALLAS.base.modulus
    n_chunk, n_chunks = 8, 3
    rng = np.random.default_rng(5)
    all_pts, all_ks, chunks = [], [], []
    for _ in range(n_chunks):
        mults = [int(k) for k in rng.integers(1, 1 << 20, size=n_chunk)]
        ks = [int(k) for k in rng.integers(1, 1 << 20, size=n_chunk)]
        pts = [ec_mul(gen, m, PALLAS.a_int, q) for m in mults]
        A = PALLAS.affine_from_ints(pts)
        s = fp.from_ints(PALLAS.scalar, ks, mont=False)
        chunks.append((A, s))
        all_pts += [(m, k) for m, k in zip(mults, ks)]
    total = stream_msm.msm_chunks(PALLAS, iter(chunks), c=4)
    got = sw.xyzz_to_affine(
        PALLAS, sw.XYZZPoints(*(x.reshape(x.shape + (1,)) for x in total))
    )
    want_scalar = sum(m * k for m, k in all_pts) % PALLAS.scalar.modulus
    E = PALLAS.affine_from_ints([ec_mul(gen, want_scalar, PALLAS.a_int, q)])
    assert np.asarray(fp.eq(got.x, E.x)).all()
    assert np.asarray(fp.eq(got.y, E.y)).all()
