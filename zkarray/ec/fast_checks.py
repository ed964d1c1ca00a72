"""Fast (endomorphism-based) subgroup membership checks.

Reference analog: BLS12-381's overridden is_in_correct_subgroup_assuming_
on_curve (curves/bls12_381/src/curves/g1.rs:69-85 — eprint 2021/1130 §6:
φ(P) == −[X²]P with the [X]P == P early-out; g2.rs:75-88 — §4:
ψ(P) == [X]P with ψ the untwist-Frobenius-twist endomorphism,
g2.rs:266-287). These replace the full r-scalar-mul in the
consensus-critical deserialize path: two 64-bit ladders instead of a
255-bit one for G1, one 64-bit ladder + a frobenius for G2.

All checks are batched; each returns a bool mask (True = in subgroup;
the identity passes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.ec import sw, sw_ext
from zkarray.ec.sw import AffinePoints, SWCurveSpec
from zkarray.ff import fp

# cube root of unity β for the G1 endomorphism φ(x, y) = (β·x, y)
# (curves/bls12_381/src/curves/g1.rs:208)
BLS12_381_BETA = 793479390729215512621379701633421447060886740281060493010456487427281649075476305620758731620350
BLS12_381_X_ABS = 0xD201000000010000

# ψ constants (curves/bls12_381/src/curves/g2.rs:243-258)
_PSI_X_C1 = 4002409555221667392624310435006688643935503118305586438271171395842971157480381377015405980053539358417135540939437
_PSI_Y = (
    2973677408986561043442465346520108879172042883009249989176415018091420807192182638567116318576472649347015917690530,
    1028732146235106349975324479215795277384839936929757896155643118032610843298655225875571310552543014690878354869257,
)


def _jac_eq(spec: SWCurveSpec, P, Q):
    """Batched projective equality: cross-multiplied Jacobian compare."""
    f = spec.base
    z1z1 = fp.mont_sqr(f, P.z)
    z2z2 = fp.mont_sqr(f, Q.z)
    x_eq = fp.eq(fp.mont_mul(f, P.x, z2z2), fp.mont_mul(f, Q.x, z1z1))
    y_eq = fp.eq(
        fp.mont_mul(f, P.y, fp.mont_mul(f, z2z2, Q.z)),
        fp.mont_mul(f, Q.y, fp.mont_mul(f, z1z1, P.z)),
    )
    i1 = sw.jac_is_inf(P)
    i2 = sw.jac_is_inf(Q)
    return jnp.where(i1 | i2, i1 == i2, x_eq & y_eq)


@functools.partial(jax.jit, static_argnums=0)
def bls12_381_g1_subgroup_check(spec: SWCurveSpec, A: AffinePoints) -> jnp.ndarray:
    """φ(P) == −[X²]P (g1.rs:69-85). ``spec`` must be bls12_381.G1."""
    f = spec.base
    P = sw.from_affine(spec, A)
    xP = sw.scalar_mul_const(spec, P, BLS12_381_X_ABS)
    # early-out: [|X|]P == P for P != ∞ ⇒ not in subgroup
    bad_fixed = _jac_eq(spec, xP, P) & ~A.inf
    x2P = sw.scalar_mul_const(spec, xP, BLS12_381_X_ABS)
    neg_x2P = sw.jac_neg(spec, x2P)
    beta = fp.const_array(f, BLS12_381_BETA, A.x.shape[1:])
    endo = sw.from_affine(spec, AffinePoints(fp.mont_mul(f, beta, A.x), A.y, A.inf))
    return (_jac_eq(spec, neg_x2P, endo) & ~bad_fixed) | A.inf


def _psi(g2curve, Q):
    """ψ(P): frobenius on coords + twist constants (g2.rs:266-287)."""
    F2 = g2curve.ops
    fq = F2.spec
    batch = F2.batch_shape_of(Q.x)
    x = F2.frobenius(Q.x, 1)
    y = F2.frobenius(Q.y, 1)
    c1 = fp.const_array(fq, _PSI_X_C1, batch)
    # x' = (−c1·x[1], c1·x[0])  (multiplication by (0, c1) in Fq2)
    x_new = jnp.stack(
        [
            fp.neg(fq, fp.mont_mul(fq, c1, x[1])),
            fp.mont_mul(fq, c1, x[0]),
        ]
    )
    y_new = F2.mul(y, F2.const(_PSI_Y, batch))
    return sw_ext.ExtAffine(x_new, y_new, Q.inf)


def _ext_jac_eq(g2curve, P, Q):
    F2 = g2curve.ops
    z1z1 = F2.sqr(P.z)
    z2z2 = F2.sqr(Q.z)
    x_eq = F2.eq(F2.mul(P.x, z2z2), F2.mul(Q.x, z1z1))
    y_eq = F2.eq(
        F2.mul(P.y, F2.mul(z2z2, Q.z)), F2.mul(Q.y, F2.mul(z1z1, P.z))
    )
    i1 = F2.is_zero(P.z)
    i2 = F2.is_zero(Q.z)
    return jnp.where(i1 | i2, i1 == i2, x_eq & y_eq)


@functools.partial(jax.jit, static_argnums=0)
def bls12_381_g2_subgroup_check(g2curve, Q) -> jnp.ndarray:
    """ψ(P) == [X]P with X negative ⇒ compare against −[|X|]P
    (g2.rs:75-88). ``g2curve`` must be bls12_381.G2, Q an ExtAffine."""
    F2 = g2curve.ops
    P = sw_ext.from_affine(g2curve, Q)
    xP = sw_ext.scalar_mul_const(g2curve, P, BLS12_381_X_ABS)
    xP = sw_ext.ExtJacobian(xP.x, F2.neg(xP.y), xP.z)  # X is negative
    psiQ = sw_ext.from_affine(g2curve, _psi(g2curve, Q))
    return _ext_jac_eq(g2curve, xP, psiQ) | Q.inf
