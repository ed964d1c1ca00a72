"""Degree-aware FFT, vanishing/filter polynomials, reindex, group-element
FFT (DomainCoeff) — reference poly/src/domain/{radix2/fft.rs:29-71,
mod.rs:213-330,332-362}."""

import numpy as np
import jax.numpy as jnp
import pytest

from zkarray.curves import bn254
from zkarray.ff import fp
from zkarray.poly.domain import Radix2Domain

SPEC = bn254.FR
P = SPEC.modulus


def test_degree_aware_fft_matches_full():
    n = 64
    dom = Radix2Domain(SPEC, n, offset_int=5)
    rng = np.random.default_rng(0)
    cs = [int(x) for x in rng.integers(1, 1 << 60, size=9)]
    coeffs = fp.from_ints(SPEC, cs)
    ev = dom.fft(coeffs)  # engages the 4·m2 <= n fast path (m2=16)
    full = dom.fft(jnp.pad(coeffs, ((0, 0), (0, n - 9))))
    assert fp.to_ints(SPEC, ev) == fp.to_ints(SPEC, full)


def test_vanishing_polynomial_sparse():
    from zkarray.poly import sparse

    dom = Radix2Domain(SPEC, 16, offset_int=3)
    degs, coeffs = dom.vanishing_polynomial()
    tau = fp.from_ints(SPEC, [12345])
    v1 = sparse.uv_evaluate(SPEC, degs, coeffs, tau)
    v2 = dom.evaluate_vanishing_polynomial(tau)
    assert fp.to_ints(SPEC, v1) == fp.to_ints(SPEC, v2)


def test_filter_polynomial():
    from zkarray.poly import dense

    big = Radix2Domain(SPEC, 16)
    sub = Radix2Domain(SPEC, 4)
    filt = big.filter_polynomial(sub)
    elems = big.elements()
    # evaluate filter at every element of the big domain
    vals = []
    for i in range(16):
        tau = elems[:, i : i + 1]
        v = dense.evaluate(SPEC, filt, tau)
        vals.append(fp.to_ints(SPEC, v)[0])
    for i, v in enumerate(vals):
        # subdomain elements sit at indices i ≡ 0 mod 4 in the big domain
        assert v == (1 if i % 4 == 0 else 0), (i, v)
    # evaluate_filter_polynomial agrees off-domain
    tau = fp.from_ints(SPEC, [987654321])
    v_direct = big.evaluate_filter_polynomial(sub, tau)
    v_poly = dense.evaluate(SPEC, filt, tau)
    assert fp.to_ints(SPEC, v_direct) == fp.to_ints(SPEC, v_poly)


def test_reindex_by_subdomain():
    big = Radix2Domain(SPEC, 16)
    sub = Radix2Domain(SPEC, 4)
    got = [big.reindex_by_subdomain(sub, i) for i in range(16)]
    # first 4 indices map onto the subgroup positions 0,4,8,12
    assert got[:4] == [0, 4, 8, 12]
    # the remaining 12 fill G \ S in order
    assert sorted(got) == sorted(set(got)) and set(got[4:]).isdisjoint({0, 4, 8, 12})


def test_group_fft_roundtrip_and_linearity():
    """FFT over G1 points: fft(k·G for scalars a_i) == k-scalars of field
    fft — check via the homomorphism x -> x·G."""
    from zkarray.poly.group_domain import SWJacobianCoeff, fft_group
    from zkarray.ec import sw

    curve = bn254.G1
    gops = SWJacobianCoeff(curve)
    n = 8
    dom = Radix2Domain(SPEC, n)
    rng = np.random.default_rng(1)
    ks = [int(x) for x in rng.integers(1, 1 << 30, size=n)]

    # points a_i·G
    G = curve.generator((1,))
    Gj = sw.from_affine(curve, sw.AffinePoints(
        jnp.repeat(G.x, n, axis=1), jnp.repeat(G.y, n, axis=1),
        jnp.zeros(n, dtype=bool)))
    pts = gops.scale_rows(Gj, ks)

    ev_pts = fft_group(dom, gops, pts)

    # oracle: field FFT of the scalars, then scalar-mul G
    coeffs = fp.from_ints(SPEC, ks, mont=False)
    # fft works on Montgomery form; convert
    coeffs_m = fp.from_ints(SPEC, ks)
    ev_sc = dom.fft(coeffs_m)
    ev_ints = fp.to_ints(SPEC, ev_sc)
    want = gops.scale_rows(Gj, ev_ints)

    got_aff = sw.to_affine(curve, ev_pts)
    want_aff = sw.to_affine(curve, want)
    assert curve.affine_to_ints(got_aff) == curve.affine_to_ints(want_aff)

    # ifft round-trips
    back = fft_group(dom, gops, ev_pts, inverse=True)
    back_aff = sw.to_affine(curve, back)
    orig_aff = sw.to_affine(curve, pts)
    assert curve.affine_to_ints(back_aff) == curve.affine_to_ints(orig_aff)
