"""Generic u64 SmallFp backend (zkarray/ff/smallfp64.py) vs Python-int
oracle — arbitrary 33-64-bit primes, not just Goldilocks (reference:
ff-macros/src/small_fp/montgomery_backend.rs:410-520 generic u64 path)."""

import numpy as np
import pytest

from zkarray.ff import smallfp64 as sf

PRIMES = [
    ((1 << 61) - 1, 37, "mersenne61"),
    (0x0000_00FF_FFFF_FC2F | (1 << 40), 3, None),  # arbitrary-looking 41-bit
    ((1 << 62) - (1 << 16) + 1, 3, "p62"),
]
# keep only real primes
def _is_prime(n):
    if n % 2 == 0:
        return False
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if a % n == 0:
            continue
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


CASES = []
for p, g, name in PRIMES:
    if _is_prime(p):
        CASES.append(sf.SmallFp64Spec(p, g, name or f"p{p.bit_length()}"))
assert len(CASES) >= 2


@pytest.mark.parametrize("spec", CASES, ids=lambda s: s.name)
def test_smallfp64_field_ops(spec):
    p = spec.modulus
    rng = np.random.default_rng(42)
    xs = [int(v) % p for v in rng.integers(0, 1 << 63, size=65)]
    ys = [int(v) % p for v in rng.integers(0, 1 << 63, size=65)]
    xs[:3] = [0, 1, p - 1]
    ys[:3] = [p - 1, p - 1, p - 1]
    a = sf.from_ints(spec, xs)
    b = sf.from_ints(spec, ys)
    assert sf.to_ints(spec, sf.mont_mul(spec, a, b)) == [
        x * y % p for x, y in zip(xs, ys)
    ]
    assert sf.to_ints(spec, sf.add(spec, a, b)) == [
        (x + y) % p for x, y in zip(xs, ys)
    ]
    assert sf.to_ints(spec, sf.sub(spec, a, b)) == [
        (x - y) % p for x, y in zip(xs, ys)
    ]
    assert sf.to_ints(spec, sf.neg(spec, a)) == [(-x) % p for x in xs]
    assert sf.to_ints(spec, sf.inv(spec, a)) == [
        pow(x, -1, p) if x else 0 for x in xs
    ]


def test_smallfp64_roundtrip_and_consts():
    spec = CASES[0]
    p = spec.modulus
    assert spec.r_int == (1 << 64) % p
    assert (spec.inv32 * p) % (1 << 32) == (1 << 32) - 1
    xs = [0, 1, 2, p - 1, p // 2]
    assert sf.to_ints(spec, sf.from_ints(spec, xs)) == xs
