"""Wahby–Boneh map for BLS12-381 G2: SWU on the 3-isogenous curve E2'/Fq2,
the rational isogeny map, and psi-based fast cofactor clearing.

Reference analog: ec/src/hashing/curve_maps/wb.rs:17-90 instantiated at G2
(curves/bls12_381/src/curves/g2_swu_iso.rs) and the psi-endomorphism
clear_cofactor [h(ψ)]P = [x²−x−1]P + [x−1]ψ(P) + ψ²(2P)
(curves/bls12_381/src/curves/g2.rs:90-121, eprint 2017/419 §4.1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zkarray.curves import bls12_381 as b381
from zkarray.ec import sw_ext as swe
from zkarray.ec.h2c import _bls12_381_g2_iso as iso
from zkarray.ec.h2c.swu_ext import swu_map_ext
from zkarray.ec.sw_ext import ExtAffine, ExtJacobian
from zkarray.ff.hash_to_field import hash_to_field_ints


def _eval_poly2(F2, coeffs, x):
    """Horner evaluation of a constant-Fq2-coefficient poly at batched x."""
    acc = F2.const(coeffs[-1], F2.batch_shape_of(x))
    for c in reversed(coeffs[:-1]):
        acc = F2.add(F2.mul(acc, x), F2.const(c, ()))
    return acc


@functools.partial(jax.jit, static_argnums=())
def _isogeny_map_g2(px, py):
    """E2'(x, y) -> E2(x', y') via the 3-isogeny rational maps."""
    F2 = b381.FQ2
    xn = _eval_poly2(F2, iso.X_MAP_NUMERATOR, px)
    xd = _eval_poly2(F2, iso.X_MAP_DENOMINATOR, px)
    yn = _eval_poly2(F2, iso.Y_MAP_NUMERATOR, px)
    yd = _eval_poly2(F2, iso.Y_MAP_DENOMINATOR, px)
    inv = F2.inv(F2.mul(xd, yd))
    x = F2.mul(F2.mul(xn, inv), yd)
    y = F2.mul(py, F2.mul(F2.mul(yn, inv), xd))
    return x, y


def bls12_381_g2_wb_map(u: jnp.ndarray) -> ExtAffine:
    """WB map: SWU on E2' then isogeny to E2 (no cofactor clearing)."""
    x, y = swu_map_ext(
        b381.FQ2, u, iso.ISO_A, iso.ISO_B, iso.ZETA,
        iso.NEG_B_OVER_A, iso.B_OVER_ZA,
    )
    x, y = _isogeny_map_g2(x, y)
    batch = b381.FQ2.batch_shape_of(u)
    return ExtAffine(x, y, jnp.zeros(batch, dtype=bool))


def _psi(A: ExtAffine) -> ExtJacobian:
    """Untwist-Frobenius-twist ψ(x, y) = (PSI_X·x̄, PSI_Y·ȳ) (g2.rs:266-291)."""
    F2 = b381.FQ2
    x = F2.mul(F2.const(iso.PSI_X, ()), F2.conjugate(A.x))
    y = F2.mul(F2.const(iso.PSI_Y, ()), F2.conjugate(A.y))
    return swe.from_affine(b381.G2, ExtAffine(x, y, A.inf))


def _psi2(P: ExtJacobian) -> ExtJacobian:
    """ψ²(X, Y, Z) = (PSI2_X·X, −Y, Z) — valid directly on Jacobian coords
    since PSI2_X scales the affine x (g2.rs:293-302)."""
    F2 = b381.FQ2
    return ExtJacobian(F2.mul(F2.const(iso.PSI2_X, ()), P.x), F2.neg(P.y), P.z)


def clear_cofactor_g2(A: ExtAffine) -> ExtJacobian:
    """[h(ψ)]P = [x²−x−1]P + [x−1]ψ(P) + ψ²(2P), x the (negative) BLS
    parameter — the reference's schedule verbatim (g2.rs:90-121)."""
    curve = b381.G2
    Pj = swe.from_affine(curve, A)
    x_p = swe.scalar_mul_const(curve, Pj, iso.BLS_X)  # [x]P
    psi_p = _psi(A)
    psi2_p2 = _psi2(swe.double(curve, Pj))
    tmp = swe.add(curve, x_p, psi_p)  # [x]P + ψ(P)
    tmp2 = swe.scalar_mul_const(curve, tmp, iso.BLS_X)  # [x²]P + [x]ψ(P)
    res = swe.add(curve, psi2_p2, tmp2)
    res = swe.add(curve, res, _neg(x_p))
    res = swe.add(curve, res, _neg(psi_p))
    return swe.add(curve, res, _neg(Pj))


def _neg(P: ExtJacobian) -> ExtJacobian:
    return ExtJacobian(P.x, b381.FQ2.neg(P.y), P.z)


def hash_to_curve_bls12_381_g2(msg: bytes, dst: bytes) -> ExtAffine:
    """Full RFC 9380 BLS12381G2_XMD:SHA-256_SSWU_RO_ pipeline (reference
    suite instantiation: curves/bls12_381/src/curves/tests/mod.rs:16)."""
    F2 = b381.FQ2
    vals = hash_to_field_ints(b381.FQ, msg, dst, 2, ext_degree=2)
    u = F2.from_ints([[vals[0][0], vals[1][0]], [vals[0][1], vals[1][1]]])
    pts = bls12_381_g2_wb_map(u)  # batch 2
    p0 = ExtAffine(pts.x[:, :, :1], pts.y[:, :, :1], pts.inf[:1])
    p1 = ExtAffine(pts.x[:, :, 1:], pts.y[:, :, 1:], pts.inf[1:])
    q = swe.add(
        b381.G2, swe.from_affine(b381.G2, p0), swe.from_affine(b381.G2, p1)
    )
    cleared = clear_cofactor_g2(swe.to_affine(b381.G2, q))
    return swe.to_affine(b381.G2, cleared)
