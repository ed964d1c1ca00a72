"""Cyclotomic fast path + GT additive group (reference: ff/src/fields/
cyclotomic.rs, ec/src/pairing.rs:130-331). Oracle: host-side tower pow."""

import numpy as np
import pytest

from zkarray.curves import bn254
from zkarray.ff import cyclotomic as cyc
from zkarray.ec.pairing import gt as gt_mod


F12 = bn254.FQ12
P = bn254.FQ.modulus
CYC_EXP = (P**6 - 1) * (P**2 + 1)  # projects into the cyclotomic subgroup


def _nest(host_elem):
    """Host tower element (nested tuples, int leaves) -> from_ints nesting
    with a batch-1 leaf."""
    if isinstance(host_elem, (list, tuple)):
        return [_nest(c) for c in host_elem]
    return [int(host_elem)]


def _host_rand(rng):
    h = F12.host

    def r(ops):
        if not hasattr(ops, "base"):
            return int(rng.integers(1, 1 << 62))
        return tuple(r(ops.base) for _ in range(ops.deg))

    return r(h)


@pytest.fixture(scope="module")
def cyc_elem():
    rng = np.random.default_rng(7)
    g = _host_rand(rng)
    return F12.host.pow(g, CYC_EXP)


def test_gs_cyclotomic_sqr_matches_full_square(cyc_elem):
    f = F12.from_ints(_nest(cyc_elem))
    got = cyc.gs_cyclotomic_sqr(F12, f)
    want = F12.sqr(f)
    assert np.asarray(F12.eq(got, want)).all()


def test_gs_sqr_differs_from_full_square_outside_subgroup():
    # sanity: the formula is only valid inside the subgroup
    rng = np.random.default_rng(8)
    g = _host_rand(rng)
    f = F12.from_ints(_nest(g))
    got = cyc.gs_cyclotomic_sqr(F12, f)
    want = F12.sqr(f)
    assert not np.asarray(F12.eq(got, want)).all()


@pytest.mark.slow
def test_cyclotomic_exp_matches_host_pow(cyc_elem):
    # slow tier: XLA:CPU intermittently SEGFAULTS compiling this exact
    # BN254-F12 NAF-scan graph under suite memory pressure (3 suite runs
    # died here in round 4; isolated runs pass). The same exp machinery is
    # exercised in the fast tier through the BLS12-381/BN254 pairing
    # bundles' final exponentiation.
    e = 0xD201000000010000  # BLS12-381 |X| — sparse, realistic
    f = F12.from_ints(_nest(cyc_elem))
    got = cyc.cyclotomic_exp(F12, f, e)
    want = F12.host.pow(cyc_elem, e)
    got_b = cyc.cyclotomic_exp_binary(F12, f, e)
    assert F12.to_ints(got) == F12.to_ints(F12.from_ints(_nest(want)))
    assert F12.to_ints(got_b) == F12.to_ints(F12.from_ints(_nest(want)))


def test_gt_group_ops(cyc_elem):
    GT = gt_mod.GTGroup(F12, bn254.FR)
    f = F12.from_ints(_nest(cyc_elem))
    # double = cyclotomic square = host f*f
    d = GT.double(f)
    want = F12.host.mul(cyc_elem, cyc_elem)
    assert F12.to_ints(d) == F12.to_ints(F12.from_ints(_nest(want)))
    # a + (-a) = 0
    z = GT.add(f, GT.neg(f))
    assert np.asarray(GT.is_zero(z)).all()
    # order-r: r·a = 0 (PairingOutput is a PrimeGroup of order r)
    zr = GT.mul_const(f, bn254.FR.modulus)
    assert np.asarray(GT.is_zero(zr)).all()


@pytest.mark.slow
def test_gt_mul_scalar_and_msm(cyc_elem):
    # slow tier: after the round-5 scan compression of gt_msm's window loop
    # (one traced window body instead of W unrolled) the pair compiles in
    # ~10 min on the 2-vCPU box — within the slow-tier per-file budget, but
    # far too heavy for the fast tier. mul_const/group ops stay fast-tier.
    from zkarray.ff import fp

    GT = gt_mod.GTGroup(F12, bn254.FR)
    n = 3
    ks = [5, 12, 1 << 40]
    pts_host = [F12.host.pow(cyc_elem, 2 * i + 1) for i in range(n)]
    pts = np.concatenate(
        [np.asarray(F12.from_ints(_nest(p))) for p in pts_host], axis=-1
    )
    import jax.numpy as jnp

    pts = jnp.asarray(pts)
    sc = fp.from_ints(bn254.FR, ks, mont=False)

    # mul_scalar on the batch
    got = gt_mod.mul_scalar(GT, pts, sc)
    for i, k in enumerate(ks):
        want = F12.host.pow(pts_host[i], k)
        got_i = [
            [[c[i : i + 1] for c in c2] for c2 in c6]
            for c6 in F12.to_ints(got)
        ]
        assert got_i == _to3(F12.from_ints(_nest(want)))

    # msm = Σ k_i · P_i
    total = gt_mod.msm(GT, pts, sc, c=3)
    want = F12.host.one()
    for k, p in zip(ks, pts_host):
        want = F12.host.mul(want, F12.host.pow(p, k))
    assert F12.to_ints(total) == F12.to_ints(F12.from_ints(_nest(want)))


def _to3(arr):
    return F12.to_ints(arr)
