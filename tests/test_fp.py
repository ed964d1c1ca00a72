"""Field law + oracle tests for the Montgomery Fp layer.

Oracle: Python big-int arithmetic mod p — the same style of checks as the
reference's __test_field! macro (test-templates/src/fields.rs:53-724):
add/mul/sub/div laws, distributivity, pow, sqrt/legendre, sum_of_products
vs naive, batch inversion.
"""

import random

import numpy as np
import pytest

from zkarray.core.fieldspec import FieldSpec
from zkarray.curves import bls12_381, bn254
from zkarray.ff import fp

SPECS = [bn254.FR, bn254.FQ, bls12_381.FR, bls12_381.FQ]

GOLDILOCKS = FieldSpec(2**64 - 2**32 + 1, generator=7, name="goldilocks")
SECP256K1_FQ = FieldSpec(2**256 - 2**32 - 977, generator=3, name="secp256k1.Fq")
ALL_SPECS = SPECS + [GOLDILOCKS, SECP256K1_FQ]

N = 64


def rand_ints(spec, n, seed=0):
    rng = random.Random(seed ^ spec.modulus)
    special = [0, 1, 2, spec.modulus - 1, spec.modulus - 2, spec.modulus // 2]
    return special + [rng.randrange(spec.modulus) for _ in range(n - len(special))]


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_roundtrip(spec):
    xs = rand_ints(spec, N)
    a = fp.from_ints(spec, xs)
    assert fp.to_ints(spec, a) == [x % spec.modulus for x in xs]


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_add_sub_neg(spec):
    p = spec.modulus
    xs, ys = rand_ints(spec, N, 1), rand_ints(spec, N, 2)
    a, b = fp.from_ints(spec, xs), fp.from_ints(spec, ys)
    assert fp.to_ints(spec, fp.add(spec, a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert fp.to_ints(spec, fp.sub(spec, a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert fp.to_ints(spec, fp.neg(spec, a)) == [(-x) % p for x in xs]
    assert fp.to_ints(spec, fp.double(spec, a)) == [(2 * x) % p for x in xs]


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_mul_sqr(spec):
    p = spec.modulus
    xs, ys = rand_ints(spec, N, 3), rand_ints(spec, N, 4)
    a, b = fp.from_ints(spec, xs), fp.from_ints(spec, ys)
    assert fp.to_ints(spec, fp.mont_mul(spec, a, b)) == [
        (x * y) % p for x, y in zip(xs, ys)
    ]
    assert fp.to_ints(spec, fp.mont_sqr(spec, a)) == [(x * x) % p for x in xs]


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_pow_inv(spec):
    p = spec.modulus
    xs = rand_ints(spec, 16, 5)
    a = fp.from_ints(spec, xs)
    e = 0xDEADBEEF12345
    assert fp.to_ints(spec, fp.pow_const(spec, a, e)) == [pow(x, e, p) for x in xs]
    got = fp.to_ints(spec, fp.inv(spec, a))
    want = [pow(x, -1, p) if x % p else 0 for x in xs]
    assert got == want


@pytest.mark.parametrize("spec", [bn254.FR, bls12_381.FQ, GOLDILOCKS], ids=lambda s: s.name)
def test_batch_inv(spec):
    p = spec.modulus
    xs = rand_ints(spec, 70, 6)
    a = fp.from_ints(spec, xs)
    got = fp.to_ints(spec, fp.batch_inv(spec, a))
    want = [pow(x, -1, p) if x % p else 0 for x in xs]
    assert got == want


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_legendre_sqrt(spec):
    p = spec.modulus
    rng = random.Random(7)
    sq = [pow(rng.randrange(1, p), 2, p) for _ in range(8)]
    xs = [0, 1] + sq + [rng.randrange(p) for _ in range(8)]
    a = fp.from_ints(spec, xs)
    leg = np.asarray(fp.legendre(spec, a))
    for i, x in enumerate(xs):
        want = 0 if x % p == 0 else (1 if pow(x, (p - 1) // 2, p) == 1 else -1)
        assert leg[i] == want, (i, x)
    root, ok = fp.sqrt(spec, a)
    root_i = fp.to_ints(spec, root)
    ok = np.asarray(ok)
    for i, x in enumerate(xs):
        if x % p == 0 or pow(x, (p - 1) // 2, p) == 1:
            assert ok[i], (i, x)
            assert pow(root_i[i], 2, p) == x % p
        else:
            assert not ok[i]


@pytest.mark.parametrize("spec", [bn254.FR, bls12_381.FQ, SECP256K1_FQ], ids=lambda s: s.name)
def test_sum_of_products_and_tree_sum(spec):
    p = spec.modulus
    n = 23
    xs, ys = rand_ints(spec, n, 8), rand_ints(spec, n, 9)
    a, b = fp.from_ints(spec, xs), fp.from_ints(spec, ys)
    got = fp.to_ints(spec, fp.sum_of_products(spec, a, b, axis=0).reshape(spec.num_limbs, 1))
    assert got == [sum(x * y for x, y in zip(xs, ys)) % p]
    got2 = fp.to_ints(spec, fp.tree_sum(spec, a, axis=0).reshape(spec.num_limbs, 1))
    assert got2 == [sum(xs) % p]


def test_fieldspec_constants():
    # arkworks-published Montgomery constants cross-check (montgomery_backend.rs
    # derives these at compile time; we derive at spec time)
    s = bls12_381.FR
    assert s.num_limbs == 16 and s.r_bits == 256
    assert s.two_adicity == 32
    assert s.r_int == (1 << 256) % s.modulus
    # 2-adic root is a primitive 2^32 root of unity
    w = s.two_adic_root_int
    assert pow(w, 1 << 32, s.modulus) == 1
    assert pow(w, 1 << 31, s.modulus) != 1
    # root_of_unity for n=8
    r8 = s.root_of_unity(8)
    assert pow(r8, 8, s.modulus) == 1 and pow(r8, 4, s.modulus) != 1
