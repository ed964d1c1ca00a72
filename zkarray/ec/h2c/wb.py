"""Wahby–Boneh map for BLS12-381 G1: SWU on the 11-isogenous curve E'
followed by the rational isogeny map and cofactor clearing.

Reference analog: ec/src/hashing/curve_maps/wb.rs:17-90 (isogeny Phi(x, y) =
(x_num(x)/x_den(x), y·y_num(x)/y_den(x)) evaluated with ark-poly + batch
inversion) and the RFC 9380 §3 pipeline hash_to_field → map ×2 → add →
clear_cofactor (ec/src/hashing/map_to_curve_hasher.rs:54-73).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zkarray.curves import bls12_381 as b381
from zkarray.ec import sw
from zkarray.ec.h2c import _bls12_381_g1_iso as iso
from zkarray.ec.h2c.swu import swu_map
from zkarray.ec.sw import AffinePoints, SWCurveSpec
from zkarray.ff import fp
from zkarray.ff.hash_to_field import hash_to_field


# the isogenous curve E' as an SWCurveSpec (generator irrelevant for mapping)
ISO_CURVE = SWCurveSpec(
    name="bls12_381.G1_iso",
    base=b381.FQ,
    scalar=b381.FR,
    a=iso.ISO_A,
    b=iso.ISO_B,
    gen_x=0,
    gen_y=0,
    cofactor=1,
)


def _eval_poly(spec, coeffs_ints, x):
    """Horner evaluation of a constant-coefficient poly at batched x."""
    acc = fp.const_array(spec, coeffs_ints[-1], x.shape[1:])
    for c in reversed(coeffs_ints[:-1]):
        acc = fp.add(spec, fp.mont_mul(spec, acc, x), fp.const_array(spec, c, ()))
    return acc


@functools.partial(jax.jit, static_argnums=())
def _isogeny_map(px, py):
    """E'(x, y) -> E(x', y') via the 11-isogeny rational maps."""
    f = b381.FQ
    xn = _eval_poly(f, iso.X_MAP_NUMERATOR, px)
    xd = _eval_poly(f, iso.X_MAP_DENOMINATOR, px)
    yn = _eval_poly(f, iso.Y_MAP_NUMERATOR, px)
    yd = _eval_poly(f, iso.Y_MAP_DENOMINATOR, px)
    inv = fp.batch_inv(f, fp.mont_mul(f, xd, yd))
    x = fp.mont_mul(f, fp.mont_mul(f, xn, inv), yd)
    y = fp.mont_mul(f, py, fp.mont_mul(f, fp.mont_mul(f, yn, inv), xd))
    return x, y


def bls12_381_g1_wb_map(u: jnp.ndarray) -> AffinePoints:
    """WB map: SWU on E' then isogeny to E (no cofactor clearing)."""
    p_iso = swu_map(ISO_CURVE, u, iso.ZETA)
    x, y = _isogeny_map(p_iso.x, p_iso.y)
    return AffinePoints(x, y, jnp.zeros(u.shape[1:], dtype=bool))


def hash_to_curve_bls12_381_g1(msg: bytes, dst: bytes) -> AffinePoints:
    """Full RFC 9380 BLS12381G1_XMD:SHA-256_SSWU_RO_ pipeline."""
    u = hash_to_field(b381.FQ, msg, dst, 2)  # (L, 2)
    pts = bls12_381_g1_wb_map(u)
    p0 = sw.from_affine(b381.G1, AffinePoints(pts.x[:, :1], pts.y[:, :1], pts.inf[:1]))
    p1 = AffinePoints(pts.x[:, 1:], pts.y[:, 1:], pts.inf[1:])
    q = sw.jac_add_mixed(b381.G1, p0, p1)
    # clear cofactor: reference uses h_eff = 0xd201000000010001 for G1
    # (curves/bls12_381/src/curves/g1.rs clear_cofactor, eprint 2019/403)
    cleared = sw.scalar_mul_const(b381.G1, q, 0xD201000000010001)
    return sw.to_affine(b381.G1, cleared)
