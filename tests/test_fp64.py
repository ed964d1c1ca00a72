"""Goldilocks (u64 SmallFp) oracle tests.

Reference: ff-macros/src/small_fp/montgomery_backend.rs:410-520 u64 path,
test-curves/src/smallfp.rs Goldilocks instantiation.
"""

import random

import numpy as np

from zkarray.ff import fp64

G = fp64.GOLDILOCKS
P = G.modulus


def test_goldilocks_field_ops():
    rng = random.Random(1)
    xs = [0, 1, P - 1, (1 << 63) + 5] + [rng.randrange(P) for _ in range(60)]
    ys = [1, P - 1, 0, (1 << 40) + 7] + [rng.randrange(P) for _ in range(60)]
    a, b = fp64.from_ints(xs), fp64.from_ints(ys)
    assert fp64.to_ints(fp64.mul(a, b)) == [(x * y) % P for x, y in zip(xs, ys)]
    assert fp64.to_ints(fp64.add(a, b)) == [(x + y) % P for x, y in zip(xs, ys)]
    assert fp64.to_ints(fp64.sub(a, b)) == [(x - y) % P for x, y in zip(xs, ys)]
    assert fp64.to_ints(fp64.neg(a)) == [(-x) % P for x in xs]
    assert fp64.to_ints(fp64.inv(G, a))[1:] == [pow(x, -1, P) for x in xs[1:]]
    assert fp64.to_ints(fp64.inv(G, a))[0] == 0  # inv(0) = 0


def test_goldilocks_ntt():
    rng = random.Random(2)
    n = 16
    w = G.root_of_unity(n)
    vals = [rng.randrange(P) for _ in range(n)]
    x = fp64.from_ints(vals)
    y = fp64.ntt(x, w)
    want = [
        sum(vals[j] * pow(w, j * k, P) for j in range(n)) % P for k in range(n)
    ]
    assert fp64.to_ints(y) == want
    assert fp64.to_ints(fp64.ntt(y, w, inverse=True)) == vals


def test_goldilocks_two_adicity():
    assert G.two_adicity == 32
    w = G.root_of_unity(1 << 10)
    assert pow(w, 1 << 10, P) == 1 and pow(w, 1 << 9, P) != 1
