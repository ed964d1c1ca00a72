"""NTT/domain tests vs a Python-int naive DFT oracle (the reference checks
FFT the same way at small sizes: poly/src/domain/radix2/mod.rs:166+)."""

import random

import numpy as np
import pytest

from zkarray.curves import bls12_381, bn254
from zkarray.ff import fp
from zkarray.poly.domain import Radix2Domain


def naive_dft(coeffs, w, p, offset=1):
    n = len(coeffs)
    return [
        sum(c * pow(offset, j, p) * pow(w, j * k, p) for j, c in enumerate(coeffs)) % p
        for k in range(n)
    ]


@pytest.mark.parametrize("spec", [bn254.FR, bls12_381.FR], ids=lambda s: s.name)
@pytest.mark.parametrize("n", [1, 2, 8, 32])
def test_fft_vs_naive(spec, n):
    p = spec.modulus
    rng = random.Random(n)
    xs = [rng.randrange(p) for _ in range(n)]
    dom = Radix2Domain(spec, n)
    got = fp.to_ints(spec, dom.fft(fp.from_ints(spec, xs)))
    assert got == naive_dft(xs, dom.group_gen_int, p)


@pytest.mark.parametrize("spec", [bn254.FR], ids=lambda s: s.name)
@pytest.mark.parametrize("n", [16])
def test_coset_fft_vs_naive(spec, n):
    p = spec.modulus
    rng = random.Random(99)
    xs = [rng.randrange(p) for _ in range(n)]
    offset = spec.generator_int
    dom = Radix2Domain(spec, n, offset_int=offset)
    got = fp.to_ints(spec, dom.fft(fp.from_ints(spec, xs)))
    assert got == naive_dft(xs, dom.group_gen_int, p, offset=offset)


@pytest.mark.parametrize("spec", [bn254.FR, bls12_381.FR], ids=lambda s: s.name)
def test_fft_ifft_roundtrip(spec):
    n = 256
    p = spec.modulus
    rng = random.Random(5)
    xs = [rng.randrange(p) for _ in range(n)]
    for offset in (1, 7):
        dom = Radix2Domain(spec, n, offset_int=offset)
        a = fp.from_ints(spec, xs)
        back = fp.to_ints(spec, dom.ifft(dom.fft(a)))
        assert back == xs


def test_degree_padding():
    spec = bn254.FR
    n = 16
    dom = Radix2Domain(spec, n)
    xs = [3, 1, 4, 1, 5]  # degree < n → pad
    p = spec.modulus
    got = fp.to_ints(spec, dom.fft(fp.from_ints(spec, xs)))
    assert got == naive_dft(xs + [0] * (n - 5), dom.group_gen_int, p)


def test_lagrange_coefficients():
    spec = bn254.FR
    p = spec.modulus
    n = 8
    dom = Radix2Domain(spec, n, offset_int=5)
    rng = random.Random(1)
    tau = rng.randrange(p)
    li = fp.to_ints(spec, dom.evaluate_all_lagrange_coefficients(fp.from_ints(spec, [tau])))
    # oracle: interpolate each unit vector
    elems = [5 * pow(dom.group_gen_int, i, p) % p for i in range(n)]
    for i in range(n):
        want = 1
        for j in range(n):
            if j != i:
                want = want * (tau - elems[j]) % p
                want = want * pow(elems[i] - elems[j], -1, p) % p
        assert li[i] == want % p, i
    # exact domain-point hit
    li2 = fp.to_ints(spec, dom.evaluate_all_lagrange_coefficients(fp.from_ints(spec, [elems[3]])))
    assert li2 == [1 if i == 3 else 0 for i in range(n)]


def test_vanishing_poly():
    spec = bn254.FR
    p = spec.modulus
    dom = Radix2Domain(spec, 16, offset_int=3)
    xs = [5, 123456789]
    got = fp.to_ints(spec, dom.evaluate_vanishing_polynomial(fp.from_ints(spec, xs)))
    assert got == [(pow(x, 16, p) - pow(3, 16, p)) % p for x in xs]


def test_fourstep_matches_flat_ladder():
    """The large-n four-step path is bit-identical to the flat radix-2
    ladder (poly/domain.py:fft_fourstep_core vs _fft_core) and round-trips
    through ifft, at the smallest four-step size."""
    import numpy as np
    from zkarray.poly import domain as dm

    spec = bn254.FR
    n = dm.FOURSTEP_MIN
    dom = Radix2Domain(spec, n)
    rng = np.random.default_rng(11)
    limbs = rng.integers(0, 1 << 16, size=(spec.num_limbs, n), dtype=np.uint32)
    limbs[-1] >>= 4
    import jax.numpy as jnp

    a = jnp.asarray(limbs)
    got = dom.fft(a)
    want = dm._fft_core(spec, a, n, dom.group_gen_int, None)
    assert np.array_equal(np.asarray(got), np.asarray(want))
    back = dom.ifft(got)
    assert np.array_equal(np.asarray(back), np.asarray(a))


def test_fourstep_big_matches_flat_ladder():
    """Chunked-execution four-step (fft_fourstep_big, the >=2^23 HBM path)
    is bit-identical to the flat ladder, exercised at a small size."""
    import numpy as np
    import jax.numpy as jnp
    from zkarray.poly import domain as dm

    spec = bn254.FR
    n = 1 << 14
    n1 = 1 << 7
    dom = Radix2Domain(spec, n)
    rng = np.random.default_rng(12)
    limbs = rng.integers(0, 1 << 16, size=(spec.num_limbs, n), dtype=np.uint32)
    limbs[-1] >>= 4
    a = jnp.asarray(limbs)
    got = dm.fft_fourstep_big(spec, a, n1, n // n1, dom.group_gen_int, None)
    want = dm._fft_core(spec, a, n, dom.group_gen_int, None)
    assert np.array_equal(np.asarray(got), np.asarray(want))
