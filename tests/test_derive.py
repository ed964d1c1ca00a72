"""Struct-derive canonical serde (reference serialize-derive/src/lib.rs):
field-order concatenation, no struct header, per-field validation, nesting.
"""

import dataclasses
import io

import numpy as np
import pytest

from zkarray.curves import bn254
from zkarray.ec.sw import AffinePoints
from zkarray.ff import fp
from zkarray.serialize import canonical as canon
from zkarray.serialize import containers as C
from zkarray.serialize import derive as D
from zkarray.serialize.wrappers import (
    COMPRESSED_CHECKED,
    COMPRESSED_UNCHECKED,
    UNCOMPRESSED_CHECKED,
)


@D.canonical
class Header:
    version: int
    label: str
    strict: bool


@D.canonical(codecs={"ids": D.vec(D.U32), "note": D.option(D.STRING)})
class Payload:
    header: Header
    ids: list
    note: object


def test_primitive_struct_wire_is_field_concatenation():
    h = Header(version=3, label="zk", strict=True)
    raw = h.serialize_with_mode(COMPRESSED_CHECKED)
    # derive adds NO header: bytes are exactly the member encodings in order
    assert raw == C.ser_u64(3) + C.ser_string("zk") + C.ser_bool(True)
    assert h.serialized_size(COMPRESSED_CHECKED) == len(raw)
    assert Header.deserialize_compressed(raw) == h


def test_nested_struct_and_combinators_roundtrip():
    p = Payload(header=Header(1, "a", False), ids=[7, 9, 11], note="hi")
    raw = p.serialize_compressed()
    assert Payload.deserialize_compressed(raw) == p
    # Option::None arm
    p2 = Payload(header=Header(2, "", True), ids=[], note=None)
    assert Payload.deserialize_compressed(p2.serialize_compressed()) == p2
    # wire: nested struct is inlined, Vec gets a u64 length prefix
    assert raw.startswith(p.header.serialize_compressed())


def test_fp_vec_codec_matches_canonical_bytes():
    spec = bn254.G1.scalar
    rng = np.random.default_rng(0)
    vals = rng.integers(1, 1 << 60, size=5)
    a = fp.const_array(spec, 0, (5,))
    import jax.numpy as jnp

    arrs = [fp.const_array(spec, int(v), ()) for v in vals]
    a = jnp.stack([x for x in arrs], axis=1).reshape(spec.num_limbs, 5)

    @D.canonical(codecs={"evals": D.fp_vec(spec)})
    class Evals:
        evals: object

    e = Evals(evals=a)
    raw = e.serialize_compressed()
    want = C.ser_u64(5) + canon.serialize_fp(spec, a).tobytes()
    assert raw == want
    back = Evals.deserialize_compressed(raw)
    assert np.array_equal(np.asarray(back.evals), np.asarray(a))
    # validate=True rejects a non-canonical (>= p) encoding
    bad = bytearray(raw)
    bad[8:40] = b"\xff" * 32
    with pytest.raises(C.SerializationError):
        Evals.deserialize_compressed(bytes(bad))
    Evals.deserialize_compressed_unchecked(bytes(bad))  # unchecked accepts


def test_sw_points_codec_modes():
    curve = bn254.G1
    ks = [1, 2, 5, 0]  # include infinity via k=0 -> explicit inf flag
    from tests.ec_oracle import ec_mul

    gen = (curve.gen_x, curve.gen_y)
    pts = [ec_mul(gen, k, curve.a_int, curve.base.modulus) if k else None for k in ks]
    A = curve.affine_from_ints(pts)

    @D.canonical(codecs={"pts": D.sw_points(curve)})
    class Proof:
        pts: object

    pr = Proof(pts=A)
    for mode in (COMPRESSED_CHECKED, COMPRESSED_UNCHECKED, UNCOMPRESSED_CHECKED):
        raw = pr.serialize_with_mode(mode)
        back = Proof.deserialize_with_mode(raw, mode)
        assert np.array_equal(np.asarray(back.pts.inf), np.asarray(A.inf))
        on = ~np.asarray(A.inf)
        assert np.array_equal(
            np.asarray(back.pts.x)[:, on], np.asarray(A.x)[:, on]
        )
    # compressed wire is smaller and sizes are mode-consistent
    assert pr.serialized_size(COMPRESSED_CHECKED) < pr.serialized_size(
        UNCOMPRESSED_CHECKED
    )
    # checked deserialization rejects an off-curve x
    raw = bytearray(pr.serialize_with_mode(COMPRESSED_CHECKED))
    raw[8] ^= 1
    with pytest.raises(C.SerializationError):
        Proof.deserialize_with_mode(bytes(raw), COMPRESSED_CHECKED)


def test_te_and_ext_point_codecs_roundtrip():
    from zkarray.curves import bls12_381 as b381
    from zkarray.curves import ed_on_bls12_381 as jj
    from tests.test_te import te_mul

    g = (jj.EDWARDS.gen_x, jj.EDWARDS.gen_y)
    tepts = jj.EDWARDS.affine_from_ints([te_mul(g, k) for k in (1, 2, 3)])

    from zkarray.ec import sw_ext
    import jax.numpy as jnp

    H = b381.G2.generator((1,))
    H2 = sw_ext.to_affine(b381.G2, sw_ext.double(b381.G2, sw_ext.from_affine(b381.G2, H)))
    g2 = sw_ext.ExtAffine(
        jnp.concatenate([H.x, H2.x], axis=-1),
        jnp.concatenate([H.y, H2.y], axis=-1),
        jnp.concatenate([H.inf, H2.inf]),
    )

    @D.canonical(codecs={"te": D.te_points(jj.EDWARDS), "g2": D.sw_points_ext(b381.G2)})
    class Mixed:
        te: object
        g2: object

    mx = Mixed(te=tepts, g2=g2)
    for mode in (COMPRESSED_CHECKED, UNCOMPRESSED_CHECKED):
        back = Mixed.deserialize_with_mode(mx.serialize_with_mode(mode), mode)
        assert jj.EDWARDS.affine_to_ints(back.te) == jj.EDWARDS.affine_to_ints(tepts)
        F2 = b381.FQ2
        assert F2.to_ints(back.g2.x) == F2.to_ints(g2.x)
        assert F2.to_ints(back.g2.y) == F2.to_ints(g2.y)


def test_string_annotations_resolve():
    # `from __future__ import annotations` turns annotations into strings;
    # primitives resolve by name, nested @canonical classes via the module
    @D.canonical
    class Inner:
        n: "int"

    globals()["_DeriveInner"] = Inner

    @D.canonical
    class Outer:
        inner: "_DeriveInner"
        tag: "str"

    o = Outer(inner=Inner(n=5), tag="x")
    assert Outer.deserialize_compressed(o.serialize_compressed()) == o


def test_missing_codec_raises():
    with pytest.raises(TypeError, match="no codec"):

        @D.canonical
        class Bad:
            x: object
