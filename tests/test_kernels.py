"""Pallas kernel parity tests (interpreter mode on CPU).

The kernels share their arithmetic body with the XLA path, so parity with
fp.* plus a Python-int oracle check is the whole contract."""

import numpy as np
import pytest

from zkarray.core.fieldspec import FieldSpec
from zkarray.curves import bls12_381
from zkarray.ff import fp
from zkarray.kernels import butterfly_stage, mont_mul, mont_sqr

SPECS = [bls12_381.G1.scalar, bls12_381.G1.base]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_pallas_mont_mul_matches_oracle(spec):
    rng = np.random.default_rng(7)
    n = 700  # not a BLOCK multiple: exercises padding
    xs = [int.from_bytes(rng.bytes(48), "little") % spec.modulus for _ in range(n)]
    ys = [int.from_bytes(rng.bytes(48), "little") % spec.modulus for _ in range(n)]
    a = fp.from_ints(spec, xs)
    b = fp.from_ints(spec, ys)
    got = fp.to_ints(spec, mont_mul(spec, a, b))
    want = [(x * y) % spec.modulus for x, y in zip(xs, ys)]
    assert got == want
    # parity with the XLA path
    assert got == fp.to_ints(spec, fp.mont_mul(spec, a, b))


def test_pallas_mont_sqr_matches_oracle():
    spec = bls12_381.G1.scalar
    rng = np.random.default_rng(8)
    xs = [int.from_bytes(rng.bytes(32), "little") % spec.modulus for _ in range(513)]
    a = fp.from_ints(spec, xs)
    got = fp.to_ints(spec, mont_sqr(spec, a))
    assert got == [(x * x) % spec.modulus for x in xs]


def test_pallas_butterfly_matches_fp():
    spec = bls12_381.G1.scalar
    rng = np.random.default_rng(9)
    n = 300
    los = [int.from_bytes(rng.bytes(32), "little") % spec.modulus for _ in range(n)]
    his = [int.from_bytes(rng.bytes(32), "little") % spec.modulus for _ in range(n)]
    ws = [int.from_bytes(rng.bytes(32), "little") % spec.modulus for _ in range(n)]
    lo = fp.from_ints(spec, los)
    hi = fp.from_ints(spec, his)
    w = fp.from_ints(spec, ws)
    a, b = butterfly_stage(spec, lo, hi, w)
    p = spec.modulus
    want_a = [(l + h * t) % p for l, h, t in zip(los, his, ws)]
    want_b = [(l - h * t) % p for l, h, t in zip(los, his, ws)]
    assert fp.to_ints(spec, a) == want_a
    assert fp.to_ints(spec, b) == want_b
