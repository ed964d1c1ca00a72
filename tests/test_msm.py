"""MSM vs naive-sum oracle (reference: test-templates/src/msm.rs:17-60 checks
Pippenger against a naive sum, including mixed scalar magnitudes)."""

import random

import pytest

from ec_oracle import ec_add, ec_mul
from zkarray.curves import bls12_381, bn254
from zkarray.ec import msm, sw
from zkarray.ff import fp


def oracle_msm(pts, ks, a, mod):
    acc = None
    for p, k in zip(pts, ks):
        acc = ec_add(acc, ec_mul(p, k, a, mod), a, mod)
    return acc


@pytest.mark.parametrize("curve", [bn254.G1, bls12_381.G1], ids=lambda c: c.name)
@pytest.mark.parametrize("n,c", [(13, 4), (64, 5)])
def test_msm_vs_naive(curve, n, c):
    a, mod = curve.a_int, curve.base.modulus
    r = curve.scalar.modulus
    rng = random.Random(n * 31 + c)
    gen = (curve.gen_x, curve.gen_y)
    pts = [ec_mul(gen, rng.randrange(1, 1 << 40), a, mod) for _ in range(n)]
    # mixed magnitudes incl. edge scalars (reference msm.rs mixed test)
    ks = [0, 1, r - 1, 2, 3] + [rng.randrange(r) for _ in range(n - 5)]
    A = curve.affine_from_ints(pts)
    s = fp.from_ints(curve.scalar, ks, mont=False)
    res = msm.msm_affine(curve, A, s, c)
    got = curve.affine_to_ints(res)[0]
    assert got == oracle_msm(pts, ks, a, mod)


def test_msm_infinity_points():
    curve = bn254.G1
    a, mod = curve.a_int, curve.base.modulus
    gen = (curve.gen_x, curve.gen_y)
    # padded to n=13 so the compiled shape is shared with
    # test_msm_vs_naive[bn254-13-4] (XLA compile dominates this file's cost)
    pts = [gen, None, ec_mul(gen, 5, a, mod), None] + [None] * 9
    ks = [3, 7, 2, 0] + [11] * 9
    A = curve.affine_from_ints(pts)
    s = fp.from_ints(curve.scalar, ks, mont=False)
    res = msm.msm_affine(curve, A, s, 4)
    got = curve.affine_to_ints(res)[0]
    assert got == oracle_msm([p for p in pts], ks, a, mod)


def test_msm_degenerate_all_equal_scalars():
    """Adversarial occupancy: every scalar identical -> one bucket per window
    holds every point; the aligned-rounds while_loop must still be exact."""
    curve = bn254.G1
    a, mod = curve.a_int, curve.base.modulus
    rng = random.Random(7)
    gen = (curve.gen_x, curve.gen_y)
    n = 64  # same (n, c) as test_msm_vs_naive[bn254-64-5]: shares the compile
    pts = [ec_mul(gen, rng.randrange(1, 1 << 40), a, mod) for _ in range(n)]
    k = rng.randrange(curve.scalar.modulus)
    ks = [k] * n
    A = curve.affine_from_ints(pts)
    s = fp.from_ints(curve.scalar, ks, mont=False)
    res = msm.msm_affine(curve, A, s, 5)
    got = curve.affine_to_ints(res)[0]
    assert got == oracle_msm(pts, ks, a, mod)


def test_msm_duplicate_points():
    """Same point repeatedly in one bucket exercises the XYZZ doubling edge."""
    curve = bn254.G1
    a, mod = curve.a_int, curve.base.modulus
    gen = (curve.gen_x, curve.gen_y)
    p5 = ec_mul(gen, 5, a, mod)
    # padded to the shared (13, 4) shape (see test_msm_infinity_points)
    pts = [gen, gen, p5, p5, gen] + [p5] * 8
    ks = [3, 3, 9, 9, 3] + [9] * 8
    A = curve.affine_from_ints(pts)
    s = fp.from_ints(curve.scalar, ks, mont=False)
    res = msm.msm_affine(curve, A, s, 4)
    got = curve.affine_to_ints(res)[0]
    assert got == oracle_msm(pts, ks, a, mod)


@pytest.mark.slow
def test_msm_2pow10_default_window():
    """Reference-scale check: 2^10 points, default window (msm.rs:17-32)."""
    curve = bn254.G1
    a, mod = curve.a_int, curve.base.modulus
    r = curve.scalar.modulus
    rng = random.Random(1010)
    gen = (curve.gen_x, curve.gen_y)
    n = 1 << 10
    multiples = [ec_mul(gen, k, a, mod) for k in range(1, 33)]
    pts = [multiples[i % 32] for i in range(n)]
    ks = [rng.randrange(r) for _ in range(n)]
    A = curve.affine_from_ints(pts)
    s = fp.from_ints(curve.scalar, ks, mont=False)
    res = msm.msm_affine(curve, A, s)
    got = curve.affine_to_ints(res)[0]
    assert got == oracle_msm(pts, ks, a, mod)


def test_chunked_msm_matches_single():
    """ChunkedMSM (carried bucket state; reference stream_pippenger.rs
    ChunkedPippenger) equals a one-shot msm, including a padded last chunk."""
    curve = bn254.G1
    a, mod = curve.a_int, curve.base.modulus
    r = curve.scalar.modulus
    rng = random.Random(42)
    gen = (curve.gen_x, curve.gen_y)
    n, chunk = 40, 16  # 2 full chunks + one 8-wide padded chunk
    pts = [ec_mul(gen, rng.randrange(1, 1 << 40), a, mod) for _ in range(n)]
    ks = [0, 1, r - 1] + [rng.randrange(r) for _ in range(n - 3)]
    A = curve.affine_from_ints(pts)
    s = fp.from_ints(curve.scalar, ks, mont=False)

    cm = msm.ChunkedMSM(curve, chunk, total_hint=n, c=5)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        sub = sw.AffinePoints(A.x[:, lo:hi], A.y[:, lo:hi], A.inf[lo:hi])
        cm.add_chunk(sub, s[:, lo:hi])
    res = cm.result()
    ax = sw.xyzz_to_affine(
        curve, sw.XYZZPoints(*(v.reshape(v.shape + (1,)) for v in res))
    )
    got = curve.affine_to_ints(ax)[0]
    want_full = msm.msm_affine(curve, A, s, 5)
    assert got == curve.affine_to_ints(want_full)[0]
    assert got == oracle_msm(pts, ks, a, mod)
