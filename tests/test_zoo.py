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


# ---- TE curve zoo (host-side validation: on-curve + birational map) ----

def test_te_zoo_on_curve():
    from zkarray.curves.te_zoo import TE_CURVES

    for name, c in TE_CURVES.items():
        p = c.base.modulus
        x, y, a, d = c.gen_x, c.gen_y, c.a_int, c.d_int
        assert (a * x * x + y * y) % p == (1 + d * x * x * y * y) % p, name


def test_te_zoo_montgomery_map():
    """A = 2(a+d)/(a-d), B = 4/(a-d) (reference MontCurveConfig consistency)."""
    from zkarray.curves.te_zoo import TE_CURVES

    for name, c in TE_CURVES.items():
        if c.mont_coeff_a is None:
            continue
        p = c.base.modulus
        a, d = c.a_int, c.d_int
        assert c.mont_coeff_a % p == (2 * (a + d) * pow(a - d, -1, p)) % p, name


def test_te_zoo_group_law_device():
    """One device check per curve: 2G + G == 3·G via ladder."""
    import numpy as np

    from zkarray.curves.te_zoo import TE_CURVES
    from zkarray.ec import te
    from zkarray.ff import fp

    for name in ("ed_on_bls12_377", "ed_on_bn254", "curve25519"):
        c = TE_CURVES[name]
        G = c.generator((1,))
        P = te.from_affine(c, G)
        three = te.add(c, te.double(c, P), P)
        sc = fp.from_ints(c.scalar, [3], mont=False)
        lhs = te.to_affine(c, three)
        rhs = te.to_affine(c, te.scalar_mul(c, G, sc))
        assert bool((fp.eq(lhs.x, rhs.x) & fp.eq(lhs.y, rhs.y)).all()), name
