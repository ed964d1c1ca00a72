"""Curve-zoo validation: every extracted config must pass generator-on-curve,
subgroup order (r·G = ∞), and field sanity — catches any extraction error.
Pure host-int math (fast; no device compile per curve)."""

import pytest

from zkarray.curves import zoo
from ec_oracle import ec_mul

CURVES = [
    zoo.SECP256K1,
    zoo.SECQ256K1,
    zoo.SECP256R1,
    zoo.SECP384R1,
    zoo.PALLAS,
    zoo.VESTA,
    zoo.GRUMPKIN,
    zoo.STARKCURVE,
    zoo.BLS12_377_G1,
]


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_generator_valid(curve):
    p = curve.base.modulus
    x, y = curve.gen_x, curve.gen_y
    assert (y * y - (x**3 + curve.a_int * x + curve.b_int)) % p == 0
    # order: r·G == infinity
    assert ec_mul((x, y), curve.scalar.modulus, curve.a_int, p) is None


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_field_sanity(curve):
    for spec in (curve.base, curve.scalar):
        # Fermat check on a few bases — rejects non-prime moduli
        for a in (2, 3, 5):
            assert pow(a, spec.modulus - 1, spec.modulus) == 1
        # two-adic root has order dividing 2^s; exact order only when the
        # configured generator really is one (the reference ships a few
        # square "generators" for fields that are never FFT'd — tolerated)
        w = spec.two_adic_root_int
        s = spec.two_adicity
        assert pow(w, 1 << s, spec.modulus) == 1
        if pow(spec.generator_int, (spec.modulus - 1) // 2, spec.modulus) != 1:
            assert pow(w, 1 << (s - 1), spec.modulus) != 1
        # sqrt QNR certified when present
        if spec.sqrt_mode == "tonelli":
            assert (
                pow(spec.sqrt_qnr, (spec.modulus - 1) // 2, spec.modulus)
                == spec.modulus - 1
            )
