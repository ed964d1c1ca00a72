"""SmallFp (native uint32 fields) tests vs Python ints — the reference's
smallfp test suite analog (test-curves/src/smallfp.rs)."""

import random

import numpy as np

from zkarray.ff import smallfp as sf


def test_mont_mul_add_sub():
    rng = random.Random(0)
    for spec in (sf.M31, sf.BABYBEAR, sf.KOALABEAR):
        p = spec.modulus
        xs = [0, 1, p - 1, p // 2] + [rng.randrange(p) for _ in range(12)]
        ys = [1, p - 1, 2, p // 3] + [rng.randrange(p) for _ in range(12)]
        a, b = sf.from_ints(spec, xs), sf.from_ints(spec, ys)
        assert sf.to_ints(spec, sf.mont_mul(spec, a, b)) == [
            x * y % p for x, y in zip(xs, ys)
        ]
        assert sf.to_ints(spec, sf.add(spec, a, b)) == [
            (x + y) % p for x, y in zip(xs, ys)
        ]
        assert sf.to_ints(spec, sf.sub(spec, a, b)) == [
            (x - y) % p for x, y in zip(xs, ys)
        ]
        assert sf.to_ints(spec, sf.inv(spec, a)) == [
            pow(x, -1, p) if x else 0 for x in xs
        ]


def test_m31_fast_mul():
    rng = random.Random(1)
    p = sf.M31.modulus
    xs = [0, 1, p - 1] + [rng.randrange(p) for _ in range(13)]
    ys = [5, p - 1, 2] + [rng.randrange(p) for _ in range(13)]
    a = np.asarray(xs, dtype=np.uint32)
    b = np.asarray(ys, dtype=np.uint32)
    got = [int(v) for v in np.asarray(sf.m31_mul(a, b))]
    assert got == [x * y % p for x, y in zip(xs, ys)]


def test_babybear_ntt_roundtrip():
    spec = sf.BABYBEAR
    p = spec.modulus
    n = 64
    rng = random.Random(2)
    xs = [rng.randrange(p) for _ in range(n)]
    w = spec.root_of_unity(n)
    a = sf.from_ints(spec, xs)
    fwd = sf.ntt(spec, a, w)
    back = sf.to_ints(spec, sf.ntt(spec, fwd, w, inverse=True))
    assert back == xs
    # spot-check vs naive DFT at a few indices
    fwd_i = sf.to_ints(spec, fwd)
    for k in (0, 1, 7):
        want = sum(x * pow(w, j * k, p) for j, x in enumerate(xs)) % p
        assert fwd_i[k] == want
