"""Twisted Edwards group tests (Jubjub) vs a Python-int TE oracle."""

import random

import numpy as np

from zkarray.curves import ed_on_bls12_381 as jj
from zkarray.ec import te
from zkarray.ff import fp

P = jj.FQ.modulus
A = jj.EDWARDS.a_int
D = jj.EDWARDS.d_int


def te_add(p, q):
    (x1, y1), (x2, y2) = p, q
    dxy = D * x1 * x2 * y1 * y2 % P
    x3 = (x1 * y2 + y1 * x2) * pow(1 + dxy, -1, P) % P
    y3 = (y1 * y2 - A * x1 * x2) * pow(1 - dxy, -1, P) % P
    return (x3, y3)


def te_mul(p, k):
    acc = (0, 1)
    for b in bin(k)[2:] if k else "":
        acc = te_add(acc, acc)
        if b == "1":
            acc = te_add(acc, p)
    return acc


def test_on_curve_and_group_laws():
    g = (jj.EDWARDS.gen_x, jj.EDWARDS.gen_y)
    rng = random.Random(0)
    ks1 = [0, 1, 2, 5, rng.randrange(jj.FR.modulus), 7]
    ks2 = [0, 3, 2, 1, rng.randrange(jj.FR.modulus), 11]
    p1 = [te_mul(g, k) for k in ks1]
    p2 = [te_mul(g, k) for k in ks2]
    A1, A2 = jj.EDWARDS.affine_from_ints(p1), jj.EDWARDS.affine_from_ints(p2)
    assert np.asarray(te.is_on_curve(jj.EDWARDS, A1)).all()
    got = jj.EDWARDS.affine_to_ints(
        te.to_affine(
            jj.EDWARDS,
            te.add(jj.EDWARDS, te.from_affine(jj.EDWARDS, A1), te.from_affine(jj.EDWARDS, A2)),
        )
    )
    assert got == [te_add(p, q) for p, q in zip(p1, p2)]
    # doubling
    got2 = jj.EDWARDS.affine_to_ints(
        te.to_affine(jj.EDWARDS, te.double(jj.EDWARDS, te.from_affine(jj.EDWARDS, A1)))
    )
    assert got2 == [te_add(p, p) for p in p1]


def test_scalar_mul():
    g = (jj.EDWARDS.gen_x, jj.EDWARDS.gen_y)
    rng = random.Random(1)
    pts = [te_mul(g, k) for k in (1, 2, 3)]
    ks = [0, 1, rng.randrange(jj.FR.modulus)]
    Ap = jj.EDWARDS.affine_from_ints(pts)
    s = fp.from_ints(jj.EDWARDS.scalar, ks, mont=False)
    got = jj.EDWARDS.affine_to_ints(
        te.to_affine(jj.EDWARDS, te.scalar_mul(jj.EDWARDS, Ap, s))
    )
    assert got == [te_mul(p, k) for p, k in zip(pts, ks)]
