"""Multi-chip (8 virtual CPU devices) sharding tests: sharded MSM and
four-step NTT vs their single-device oracles."""

import random

import numpy as np
import pytest

from ec_oracle import ec_mul
from test_msm import oracle_msm
from zkarray.curves import bn254
from zkarray.dist import make_mesh, fft_fourstep, fft_sharded, msm_sharded
from zkarray.ec import sw
from zkarray.ff import fp
from zkarray.poly.domain import Radix2Domain

import jax


def test_msm_sharded_vs_oracle():
    curve = bn254.G1
    a, mod, r = curve.a_int, curve.base.modulus, curve.scalar.modulus
    rng = random.Random(42)
    n = 32
    gen = (curve.gen_x, curve.gen_y)
    pts = [ec_mul(gen, rng.randrange(1, 1 << 30), a, mod) for _ in range(n)]
    ks = [rng.randrange(r) for _ in range(n)]
    A = curve.affine_from_ints(pts)
    s = fp.from_ints(curve.scalar, ks, mont=False)
    mesh = make_mesh(8)
    res = msm_sharded(curve, A, s, mesh, c=4)
    aff = sw.xyzz_to_affine(
        curve, sw.XYZZPoints(*(x.reshape(x.shape + (1,)) for x in res))
    )
    assert curve.affine_to_ints(aff)[0] == oracle_msm(pts, ks, a, mod)


def test_fourstep_vs_domain():
    spec = bn254.FR
    n = 64
    rng = random.Random(3)
    xs = [rng.randrange(spec.modulus) for _ in range(n)]
    dom = Radix2Domain(spec, n)
    a = fp.from_ints(spec, xs)
    want = fp.to_ints(spec, dom.fft(a))
    got = fp.to_ints(spec, fft_fourstep(spec, a, 8, 8, dom.group_gen_int))
    assert got == want


def test_fft_sharded_vs_domain():
    spec = bn254.FR
    n = 64
    rng = random.Random(4)
    xs = [rng.randrange(spec.modulus) for _ in range(n)]
    dom = Radix2Domain(spec, n)
    a = fp.from_ints(spec, xs)
    want = fp.to_ints(spec, dom.fft(a))
    mesh = make_mesh(8)
    out = fft_sharded(spec, a, mesh, dom.group_gen_int, n1=8)
    got = fp.to_ints(spec, np.asarray(out))
    assert got == want
