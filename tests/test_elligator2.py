"""Elligator2 map property test on Jubjub: images land on the curve."""

import random

import numpy as np

from zkarray.curves import ed_on_bls12_381 as jj
from zkarray.ec import te
from zkarray.ec.h2c.elligator2 import elligator2_map
from zkarray.ff import fp


def test_elligator2_on_curve():
    p = jj.FQ.modulus
    rng = random.Random(0)
    us = [0, 1, 2] + [rng.randrange(p) for _ in range(5)]
    u = fp.from_ints(jj.FQ, us)
    # Z = smallest non-residue works as the Elligator2 Z parameter
    zeta = jj.FQ.sqrt_qnr if jj.FQ.sqrt_mode == "tonelli" else 5
    pts = elligator2_map(jj.EDWARDS, u, int(zeta))
    assert np.asarray(te.is_on_curve(jj.EDWARDS, pts)).all()
    # determinism
    pts2 = elligator2_map(jj.EDWARDS, u, int(zeta))
    assert np.asarray(fp.eq(pts.x, pts2.x)).all()


def test_elligator2_bandersnatch_smoke():
    """Elligator2 on bandersnatch (TE + Montgomery coefficients from
    curves/ed_on_bls12_381_bandersnatch/src/curves/mod.rs): images land on
    the curve and the map is deterministic."""
    from zkarray.curves.te_zoo import TE_CURVES

    c = TE_CURVES["ed_on_bls12_381_bandersnatch"]
    p = c.base.modulus
    rng = random.Random(1)
    us = [0, 1] + [rng.randrange(p) for _ in range(6)]
    u = fp.from_ints(c.base, us)
    zeta = c.base.sqrt_qnr if c.base.sqrt_mode == "tonelli" else 5
    pts = elligator2_map(c, u, int(zeta))
    assert np.asarray(te.is_on_curve(c, pts)).all()
    pts2 = elligator2_map(c, u, int(zeta))
    assert np.asarray(fp.eq(pts.x, pts2.x)).all()
