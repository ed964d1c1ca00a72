"""Dense/sparse polynomial + MLE tests vs Python-int oracles."""

import random

import numpy as np
import pytest

from zkarray.curves import bn254
from zkarray.ff import fp
from zkarray.poly import dense, mle, sparse
from zkarray.poly.evaluations import Evaluations
from zkarray.poly.domain import Radix2Domain

SPEC = bn254.FR
P = SPEC.modulus


def poly_eval(cs, x):
    acc = 0
    for c in reversed(cs):
        acc = (acc * x + c) % P
    return acc


def test_dense_evaluate():
    rng = random.Random(0)
    n = 37
    cs = [rng.randrange(P) for _ in range(n)]
    taus = [0, 1, rng.randrange(P), rng.randrange(P)]
    got = fp.to_ints(
        SPEC, dense.evaluate(SPEC, fp.from_ints(SPEC, cs), fp.from_ints(SPEC, taus))
    )
    assert got == [poly_eval(cs, t) for t in taus]


def test_dense_mul_naive_and_fft():
    rng = random.Random(1)
    a = [rng.randrange(P) for _ in range(7)]
    b = [rng.randrange(P) for _ in range(5)]
    want = [0] * 11
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            want[i + j] = (want[i + j] + x * y) % P
    da, db = fp.from_ints(SPEC, a), fp.from_ints(SPEC, b)
    assert fp.to_ints(SPEC, dense.naive_mul(SPEC, da, db)) == want
    # FFT path (force by larger inputs)
    a2 = [rng.randrange(P) for _ in range(20)]
    b2 = [rng.randrange(P) for _ in range(15)]
    want2 = [0] * 34
    for i, x in enumerate(a2):
        for j, y in enumerate(b2):
            want2[i + j] = (want2[i + j] + x * y) % P
    got2 = fp.to_ints(SPEC, dense.mul(SPEC, fp.from_ints(SPEC, a2), fp.from_ints(SPEC, b2)))
    assert got2 == want2


def test_divide_by_vanishing():
    rng = random.Random(2)
    n = 8
    m = 29
    cs = [rng.randrange(P) for _ in range(m)]
    q, r = dense.divide_by_vanishing_poly(SPEC, fp.from_ints(SPEC, cs), n)
    qi, ri = fp.to_ints(SPEC, q), fp.to_ints(SPEC, r)
    # check c == q·(x^n - 1) + r at random points
    for _ in range(4):
        x = rng.randrange(P)
        lhs = poly_eval(cs, x)
        rhs = (poly_eval(qi, x) * (pow(x, n, P) - 1) + poly_eval(ri, x)) % P
        assert lhs == rhs


def test_long_division():
    rng = random.Random(3)
    a = [rng.randrange(P) for _ in range(13)]
    b = [rng.randrange(P) for _ in range(5)]
    q, r = dense.divide_with_q_and_r(SPEC, fp.from_ints(SPEC, a), fp.from_ints(SPEC, b))
    qi, ri = fp.to_ints(SPEC, q), fp.to_ints(SPEC, r)
    for _ in range(4):
        x = rng.randrange(P)
        assert poly_eval(a, x) == (poly_eval(qi, x) * poly_eval(b, x) + poly_eval(ri, x)) % P


def test_mle_fix_and_eval():
    rng = random.Random(4)
    k = 4
    evals = [rng.randrange(P) for _ in range(1 << k)]
    pt = [rng.randrange(P) for _ in range(k)]
    got = fp.to_ints(
        SPEC,
        mle.evaluate(SPEC, fp.from_ints(SPEC, evals), fp.from_ints(SPEC, pt)),
    )
    # oracle: multilinear interpolation Σ_b e[b]·Π_j (b_j x_j + (1-b_j)(1-x_j))
    want = 0
    for bidx, e in enumerate(evals):
        term = e
        for j in range(k):
            bj = (bidx >> j) & 1
            term = term * ((pt[j] if bj else (1 - pt[j])) % P) % P
        want = (want + term) % P
    assert got == [want]


def test_sparse_uv_eval():
    rng = random.Random(5)
    terms = [(0, 5), (3, rng.randrange(P)), (100, rng.randrange(P))]
    degs, cs = sparse.uv_from_terms(SPEC, terms)
    taus = [2, rng.randrange(P)]
    got = fp.to_ints(SPEC, sparse.uv_evaluate(SPEC, degs, cs, fp.from_ints(SPEC, taus)))
    want = [sum(c * pow(t, d, P) for d, c in terms) % P for t in taus]
    assert got == want


def test_sparse_mv_eval():
    rng = random.Random(6)
    # 3 vars: 5 + 2·x0²x2 + 7·x1
    terms = [(5, []), (2, [(0, 2), (2, 1)]), (7, [(1, 1)])]
    powers, cs = sparse.mv_from_terms(SPEC, 3, terms)
    pt = [rng.randrange(P) for _ in range(3)]
    got = fp.to_ints(SPEC, sparse.mv_evaluate(SPEC, powers, cs, fp.from_ints(SPEC, pt)))
    want = (5 + 2 * pow(pt[0], 2, P) * pt[2] + 7 * pt[1]) % P
    assert got == [want]


def test_evaluations_algebra():
    rng = random.Random(7)
    n = 16
    dom = Radix2Domain(SPEC, n)
    a = [rng.randrange(P) for _ in range(n)]
    b = [rng.randrange(1, P) for _ in range(n)]
    ea = Evaluations(dom, fp.from_ints(SPEC, a))
    eb = Evaluations(dom, fp.from_ints(SPEC, b))
    assert fp.to_ints(SPEC, (ea * eb).evals) == [x * y % P for x, y in zip(a, b)]
    assert fp.to_ints(SPEC, (ea / eb).evals) == [
        x * pow(y, -1, P) % P for x, y in zip(a, b)
    ]
    # interpolate round-trip
    coeffs = ea.interpolate()
    back = Evaluations.from_coeffs(dom, coeffs)
    assert fp.to_ints(SPEC, back.evals) == a


def test_sparse_mle_fix_variables_and_to_dense():
    """Sparse fix_variables + to_dense agree with the dense MLE fold
    (reference sparse.rs fix_variables)."""
    import jax.numpy as jnp

    nv = 4
    entries = {0: 7, 3: 11, 9: 5, 14: 13}
    dense_tab = [entries.get(i, 0) for i in range(1 << nv)]
    d = fp.from_ints(SPEC, dense_tab)
    idx = jnp.asarray(np.asarray(sorted(entries), dtype=np.int32))
    vals = fp.from_ints(SPEC, [entries[i] for i in sorted(entries)])

    r = fp.from_ints(SPEC, [21, 34])  # fix first two variables
    want = mle.fix_variables(SPEC, d, r)

    nidx, nvals = mle.fix_variables_sparse(SPEC, idx, vals, r, 2)
    got = mle.sparse_to_dense(SPEC, nidx, nvals, nv - 2)
    assert fp.to_ints(SPEC, got) == fp.to_ints(SPEC, want)

    # full evaluation via evaluate_sparse matches dense evaluate
    pt = fp.from_ints(SPEC, [3, 1, 4, 1])
    ev_d = mle.evaluate(SPEC, d, pt)
    ev_s = mle.evaluate_sparse(SPEC, idx, vals, pt)
    assert fp.to_ints(SPEC, ev_d) == fp.to_ints(SPEC, ev_s)


def test_sparse_ring_ops():
    """Sparse add/sub/neg with like-term combination and zero dropping
    (reference univariate/sparse.rs:139-235, multivariate/sparse.rs:126-214)."""
    rng = random.Random(8)
    # univariate: overlapping degrees, one exact cancellation at degree 3
    c3 = rng.randrange(1, P)
    a = sparse.uv_from_terms(SPEC, [(0, 5), (3, c3), (9, 11)])
    b = sparse.uv_from_terms(SPEC, [(3, P - c3), (4, 2), (9, 1)])
    degs, cs = sparse.uv_add(SPEC, a, b)
    assert np.asarray(degs).tolist() == [0, 4, 9]  # degree 3 cancelled
    tau = rng.randrange(P)
    got = fp.to_ints(SPEC, sparse.uv_evaluate(SPEC, degs, cs, fp.from_ints(SPEC, [tau])))
    want = (5 + 2 * pow(tau, 4, P) + 12 * pow(tau, 9, P)) % P
    assert got == [want]
    # sub: a - a = 0 (empty term list)
    degs0, cs0 = sparse.uv_sub(SPEC, a, a)
    assert np.asarray(degs0).shape[0] == 0

    # multivariate
    ta = [(5, []), (2, [(0, 2), (2, 1)]), (7, [(1, 1)])]
    tb = [(P - 7, [(1, 1)]), (3, [(0, 2), (2, 1)]), (1, [(2, 3)])]
    A = sparse.mv_from_terms(SPEC, 3, ta)
    B = sparse.mv_from_terms(SPEC, 3, tb)
    powers, cs = sparse.mv_add(SPEC, A, B)
    assert powers.shape[0] == 3  # x1 term cancelled; {const, x0²x2, x2³}
    pt = [rng.randrange(P) for _ in range(3)]
    got = fp.to_ints(SPEC, sparse.mv_evaluate(SPEC, powers, cs, fp.from_ints(SPEC, pt)))
    want = (5 + 5 * pow(pt[0], 2, P) * pt[2] + pow(pt[2], 3, P)) % P
    assert got == [want]
    # neg + add = sub
    pn, cn = sparse.mv_sub(SPEC, A, B)
    got2 = fp.to_ints(SPEC, sparse.mv_evaluate(SPEC, pn, cn, fp.from_ints(SPEC, pt)))
    wa = (5 + 2 * pow(pt[0], 2, P) * pt[2] + 7 * pt[1]) % P
    wb = ((P - 7) * pt[1] + 3 * pow(pt[0], 2, P) * pt[2] + pow(pt[2], 3, P)) % P
    assert got2 == [(wa - wb) % P]


def test_sparse_uv_evaluate_over_domain():
    """O(terms·n) sparse domain evaluation vs the per-point sparse eval on
    the domain elements (reference sparse.rs:294-306), incl. a coset."""
    from zkarray.poly.domain import Radix2Domain

    terms = [(0, 7), (3, 11), (17, 123456789), (31, 5)]
    degs, cs = sparse.uv_from_terms(SPEC, terms)
    for offset in (1, 5):
        dom = Radix2Domain(SPEC, 32, offset_int=offset)
        got = fp.to_ints(
            SPEC, sparse.uv_evaluate_over_domain(SPEC, degs, cs, dom)
        )
        want = fp.to_ints(
            SPEC, sparse.uv_evaluate(SPEC, degs, cs, dom.elements())
        )
        assert got == want
