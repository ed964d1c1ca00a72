"""Mixed-radix domain tests over a small-subgroup field (MNT6-753-style:
q = 5). Uses bn254.Fr? No — needs q | p-1; use a custom 2^s·5^b field: the
reference's test bed is MNT6-753 (q=5); here we use its actual modulus."""

import random

import pytest

from zkarray.core.fieldspec import FieldSpec
from zkarray.ff import fp
from zkarray.poly.domain import GeneralDomain, Radix2Domain
from zkarray.poly.mixed_radix import MixedRadixDomain, best_mixed_domain_size

# MNT6-753 Fr (= MNT4-753 Fq): 2-adicity 15, small subgroup 5^2
# (reference test-curves/src/mnt4_753/fq.rs)
MNT6_753_FR_MOD = 41898490967918953402344214791240637128170709919953949071783502921025352812571106773058893763790338921418070971888253786114353726529584385201591605722013126468931404347949840543007986327743462853720628051692141265303114721689601


@pytest.fixture(scope="module")
def spec():
    # Fermat sanity then build spec with small subgroup base 5
    assert pow(2, MNT6_753_FR_MOD - 1, MNT6_753_FR_MOD) == 1
    return FieldSpec(
        MNT6_753_FR_MOD, generator=17, name="mnt6_753.Fr", small_subgroup_base=5
    )


def naive_dft(xs, w, p):
    n = len(xs)
    return [sum(x * pow(w, j * k, p) for j, x in enumerate(xs)) % p for k in range(n)]


def test_mixed_fft_vs_naive(spec):
    p = spec.modulus
    n = 20  # 4 · 5
    dom = MixedRadixDomain(spec, n)
    rng = random.Random(0)
    xs = [rng.randrange(p) for _ in range(n)]
    got = fp.to_ints(spec, dom.fft(fp.from_ints(spec, xs)))
    assert got == naive_dft(xs, dom.group_gen_int, p)


def test_mixed_fft_roundtrip(spec):
    p = spec.modulus
    n = 40  # 8 · 5
    dom = MixedRadixDomain(spec, n)
    rng = random.Random(1)
    xs = [rng.randrange(p) for _ in range(n)]
    back = fp.to_ints(spec, dom.ifft(dom.fft(fp.from_ints(spec, xs))))
    assert back == xs


def test_best_size_and_general(spec):
    assert best_mixed_domain_size(spec, 20) == 20
    assert best_mixed_domain_size(spec, 21) == 25
    d = GeneralDomain(spec, 6)
    assert isinstance(d, Radix2Domain) and d.size == 8
    # beyond 2-adicity → mixed
    big = GeneralDomain(spec, (1 << spec.two_adicity) + 1)
    assert isinstance(big, MixedRadixDomain)
