"""Tower-field tests: device ops vs host-int tower oracle + algebraic laws.

Mirrors the reference's __test_field! coverage for Fq2/Fq6/Fq12
(test-templates/src/fields.rs): mul/sqr/inv laws, frobenius vs pow-by-p.
"""

import random

import numpy as np
import pytest

from zkarray.curves import bls12_381 as b
from zkarray.ff.tower_host import HostExt, HostPrime

TOWERS = [b.FQ2, b.FQ6, b.FQ12]


def rand_host(host, rng):
    if isinstance(host, HostPrime):
        return rng.randrange(host.p)
    return tuple(rand_host(host.base, rng) for _ in range(host.deg))


def to_device(ops, elems):
    """list of host elems -> batched device array."""
    def nest(es, host):
        if isinstance(host, HostPrime):
            return list(es)
        return [nest([e[j] for e in es], host.base) for j in range(host.deg)]
    return ops.from_ints(nest(elems, ops.host))


def _flatten(ops, arr):
    out = []
    if hasattr(ops, "deg"):
        for j in range(ops.deg):
            out.extend(_flatten(ops.base, arr[j]))
    else:
        out.append(ops.to_ints(arr))
    return out


@pytest.mark.parametrize("ops", TOWERS, ids=lambda o: o.name)
def test_mul_sqr_inv_vs_host(ops):
    rng = random.Random(hash(ops.name) & 0xFFFF)
    n = 4
    xs = [rand_host(ops.host, rng) for _ in range(n)]
    ys = [rand_host(ops.host, rng) for _ in range(n)]
    a, c = to_device(ops, xs), to_device(ops, ys)
    got_mul = _flatten(ops, ops.mul(a, c))  # position-major
    want_mul = [ops.host.flatten(ops.host.mul(x, y)) for x, y in zip(xs, ys)]
    assert got_mul == [list(col) for col in zip(*want_mul)]
    got_sqr = _flatten(ops, ops.sqr(a))
    want_sqr = [ops.host.flatten(ops.host.mul(x, x)) for x in xs]
    assert got_sqr == [list(col) for col in zip(*want_sqr)]
    # inverse: a · a^{-1} == 1
    prod = ops.mul(a, ops.inv(a))
    one = ops.one((n,))
    assert np.asarray(ops.eq(prod, one)).all()


@pytest.mark.parametrize("ops", TOWERS, ids=lambda o: o.name)
def test_frobenius_vs_host(ops):
    rng = random.Random(11)
    x = rand_host(ops.host, rng)
    a = to_device(ops, [x])
    for i in (1, 2, ops.deg_abs - 1):
        want = ops.host.flatten(ops.host.frobenius(x, i))
        flat_cols = _flatten(ops, ops.frobenius(a, i))
        assert [c[0] for c in flat_cols] == want, i


def test_host_frobenius_consistent():
    # host frobenius == pow by p (checked on Fq2 where pow is affordable)
    rng = random.Random(5)
    host = b.FQ2.host
    p = b.FQ.modulus
    x = rand_host(host, rng)
    assert host.frobenius(x, 1) == host.pow(x, p)
    assert host.frobenius(x, 2) == x
