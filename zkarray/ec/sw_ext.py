"""Short-Weierstrass group ops over ANY field of the tower (generic in a
FieldOps object from zkarray.ff.towers) — used for G2 (curve over Fp2/Fp3)
and any extension-field curve.

Reference analog: ark-ec's group model is generic over the base field by
construction (ec/src/models/short_weierstrass/group.rs works for G1 and G2
alike); here the prime-field fast path lives in ec/sw.py and this module
provides the tower-generic equivalent (same EFD formulas, branchless masks).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ExtAffine(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray


class ExtJacobian(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class ExtCurveSpec:
    """Curve y² = x³ + a x + b over the field given by ``ops``."""

    def __init__(self, name, ops, scalar_spec, a_host, b_host, gen_x_host, gen_y_host, cofactor=1):
        self.name = name
        self.ops = ops
        self.scalar = scalar_spec
        self.a_host = a_host
        self.b_host = b_host
        self.gen_x = gen_x_host
        self.gen_y = gen_y_host
        self.cofactor = cofactor
        self.a_is_zero = ops.host.eq(a_host, ops.host.zero()) if hasattr(ops.host, "eq") else a_host == 0

    def __hash__(self):
        return hash((self.name, self.ops))

    def __eq__(self, o):
        return isinstance(o, ExtCurveSpec) and o.name == self.name and o.ops == self.ops

    def generator(self, batch_shape=()):
        F = self.ops
        return ExtAffine(
            F.const(self.gen_x, batch_shape),
            F.const(self.gen_y, batch_shape),
            jnp.zeros(batch_shape, dtype=bool),
        )


def is_inf(curve, P: ExtJacobian):
    return curve.ops.is_zero(P.z)


def zero(curve, batch_shape=()):
    F = curve.ops
    return ExtJacobian(F.one(batch_shape), F.one(batch_shape), F.zero(batch_shape))


def from_affine(curve, A: ExtAffine) -> ExtJacobian:
    F = curve.ops
    batch = F.batch_shape_of(A.x)
    return ExtJacobian(A.x, A.y, F.select(A.inf, F.zero(batch), F.one(batch)))


def _sel(curve, mask, P: ExtJacobian, Q: ExtJacobian) -> ExtJacobian:
    F = curve.ops
    return ExtJacobian(
        F.select(mask, P.x, Q.x), F.select(mask, P.y, Q.y), F.select(mask, P.z, Q.z)
    )


@functools.partial(jax.jit, static_argnums=0)
def double(curve, P: ExtJacobian) -> ExtJacobian:
    F = curve.ops
    X1, Y1, Z1 = P
    XX = F.sqr(X1)
    YY = F.sqr(Y1)
    YYYY = F.sqr(YY)
    ZZ = F.sqr(Z1)
    S = F.double(F.sub(F.sub(F.sqr(F.add(X1, YY)), XX), YYYY))
    M = F.add(F.double(XX), XX)
    if not curve.a_is_zero:
        a_c = F.const(curve.a_host, ())
        M = F.add(M, F.mul(a_c, F.sqr(ZZ)))
    X3 = F.sub(F.sqr(M), F.double(S))
    Y3 = F.sub(F.mul(M, F.sub(S, X3)), F.double(F.double(F.double(YYYY))))
    Z3 = F.sub(F.sub(F.sqr(F.add(Y1, Z1)), YY), ZZ)
    return ExtJacobian(X3, Y3, Z3)


@functools.partial(jax.jit, static_argnums=0)
def add(curve, P: ExtJacobian, Q: ExtJacobian) -> ExtJacobian:
    F = curve.ops
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = F.sqr(Z1)
    Z2Z2 = F.sqr(Z2)
    U1 = F.mul(X1, Z2Z2)
    U2 = F.mul(X2, Z1Z1)
    S1 = F.mul(Y1, F.mul(Z2, Z2Z2))
    S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
    H = F.sub(U2, U1)
    r = F.double(F.sub(S2, S1))
    I = F.sqr(F.double(H))
    J = F.mul(H, I)
    V = F.mul(U1, I)
    X3 = F.sub(F.sub(F.sqr(r), J), F.double(V))
    Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.double(F.mul(S1, J)))
    Z3 = F.mul(F.sub(F.sub(F.sqr(F.add(Z1, Z2)), Z1Z1), Z2Z2), H)
    R = ExtJacobian(X3, Y3, Z3)
    h0 = F.is_zero(H)
    r0 = F.is_zero(r)
    p_inf = is_inf(curve, P)
    q_inf = is_inf(curve, Q)
    both = ~p_inf & ~q_inf
    R = _sel(curve, both & h0 & r0, double(curve, P), R)
    R = _sel(curve, both & h0 & ~r0, zero(curve, F.batch_shape_of(X1)), R)
    R = _sel(curve, p_inf, Q, R)
    R = _sel(curve, q_inf, P, R)
    return R


@functools.partial(jax.jit, static_argnums=(0, 2))
def scalar_mul_const(curve, P: ExtJacobian, k: int) -> ExtJacobian:
    if k == 0:
        return zero(curve, curve.ops.batch_shape_of(P.x))
    neg_ = k < 0
    k = abs(k)
    bits = jnp.asarray(np.asarray([int(b) for b in bin(k)[2:]], dtype=np.uint32))

    def body(acc, bit):
        acc = double(curve, acc)
        added = add(curve, acc, P)
        return _sel(curve, bit == 1, added, acc), None

    acc, _ = jax.lax.scan(body, zero(curve, curve.ops.batch_shape_of(P.x)), bits)
    F = curve.ops
    return ExtJacobian(acc.x, F.neg(acc.y), acc.z) if neg_ else acc


@functools.partial(jax.jit, static_argnums=0)
def to_affine(curve, P: ExtJacobian) -> ExtAffine:
    F = curve.ops
    zinv = F.inv(P.z)  # inv(0) = 0 → infinity maps to (0, 0)
    zinv2 = F.sqr(zinv)
    return ExtAffine(
        F.mul(P.x, zinv2), F.mul(P.y, F.mul(zinv, zinv2)), is_inf(curve, P)
    )


@functools.partial(jax.jit, static_argnums=0)
def is_on_curve(curve, A: ExtAffine):
    F = curve.ops
    y2 = F.sqr(A.y)
    rhs = F.add(F.mul(F.sqr(A.x), A.x), F.const(curve.b_host, F.batch_shape_of(A.x)))
    if not curve.a_is_zero:
        rhs = F.add(rhs, F.mul(F.const(curve.a_host, ()), A.x))
    return F.eq(y2, rhs) | A.inf
