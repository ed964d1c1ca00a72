"""Short-Weierstrass group arithmetic, batched over planar limb arrays.

Reference analog: ark-ec's short_weierstrass model (ec/src/models/
short_weierstrass/{mod.rs:34-230, affine.rs, group.rs, bucket.rs}): Jacobian
projective points with dbl-2009-l (a=0) / dbl-2007-bl doubling and
add-2007-bl / madd-2007-bl addition, plus extended-Jacobian XYZZ "Bucket"
coordinates for MSM bucket accumulation. The reference branches on edge cases
(identity, doubling); here every op computes all candidates and selects with
batch masks — branchless, trace-once, ideal for TPU.

Point batches are structure-of-arrays NamedTuples of (L, *batch) limb
tensors. Infinity: Jacobian z == 0, XYZZ zz == 0, Affine explicit mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.core import limbs as lb
from zkarray.core.fieldspec import FieldSpec
from zkarray.ff import fp


class AffinePoints(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray  # bool, batch-shaped


class JacobianPoints(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray  # z == 0 encodes infinity


class XYZZPoints(NamedTuple):
    """(X/ZZ, Y/ZZZ) with ZZ^3 == ZZZ^2 (reference: bucket.rs:14-30)."""

    x: jnp.ndarray
    y: jnp.ndarray
    zz: jnp.ndarray
    zzz: jnp.ndarray


class SWCurveSpec:
    """y^2 = x^3 + a x + b over base field; reference: SWCurveConfig
    (ec/src/models/short_weierstrass/mod.rs:34-230)."""

    def __init__(
        self,
        name: str,
        base: FieldSpec,
        scalar: FieldSpec,
        a: int,
        b: int,
        gen_x: int,
        gen_y: int,
        cofactor: int = 1,
    ):
        self.name = name
        self.base = base
        self.scalar = scalar
        self.a_int = a % base.modulus
        self.b_int = b % base.modulus
        self.gen_x = gen_x
        self.gen_y = gen_y
        self.cofactor = cofactor
        self.a_is_zero = self.a_int == 0

    def __hash__(self):
        return hash((self.name, self.base, self.scalar, self.a_int, self.b_int))

    def __eq__(self, other):
        return isinstance(other, SWCurveSpec) and (
            self.name,
            self.base,
            self.a_int,
            self.b_int,
        ) == (other.name, other.base, other.a_int, other.b_int)

    def __repr__(self):
        return f"SWCurveSpec({self.name})"

    # ---- host constructors ----

    def generator(self, batch_shape=()) -> AffinePoints:
        return AffinePoints(
            fp.const_array(self.base, self.gen_x, batch_shape),
            fp.const_array(self.base, self.gen_y, batch_shape),
            jnp.zeros(batch_shape, dtype=bool),
        )

    def affine_from_ints(self, xys) -> AffinePoints:
        """[(x, y) or None] -> AffinePoints batch (None = infinity)."""
        xs = [0 if p is None else p[0] for p in xys]
        ys = [0 if p is None else p[1] for p in xys]
        inf = np.asarray([p is None for p in xys])
        return AffinePoints(
            fp.from_ints(self.base, xs), fp.from_ints(self.base, ys), jnp.asarray(inf)
        )

    def affine_to_ints(self, pts: AffinePoints):
        """AffinePoints -> [(x, y) | None] host list."""
        xs = fp.to_ints(self.base, pts.x)
        ys = fp.to_ints(self.base, pts.y)
        inf = np.asarray(pts.inf).reshape(-1)
        return [None if i else (x, y) for x, y, i in zip(xs, ys, inf)]


# ---------------------------------------------------------------------------
# point predicates / conversions
# ---------------------------------------------------------------------------

def jac_is_inf(P: JacobianPoints) -> jnp.ndarray:
    return lb.is_zero(P.z)


def xyzz_is_inf(P: XYZZPoints) -> jnp.ndarray:
    return lb.is_zero(P.zz)


def jac_zero(spec: SWCurveSpec, batch_shape=()) -> JacobianPoints:
    f = spec.base
    return JacobianPoints(fp.one(f, batch_shape), fp.one(f, batch_shape), fp.zero(f, batch_shape))


def xyzz_zero(spec: SWCurveSpec, batch_shape=()) -> XYZZPoints:
    f = spec.base
    z = fp.zero(f, batch_shape)
    return XYZZPoints(fp.one(f, batch_shape), fp.one(f, batch_shape), z, z)


def from_affine(spec: SWCurveSpec, A: AffinePoints) -> JacobianPoints:
    f = spec.base
    batch = A.x.shape[1:]
    z = fp.select(A.inf, fp.zero(f, batch), fp.one(f, batch))
    return JacobianPoints(A.x, A.y, z)


def _select_jac(mask, P: JacobianPoints, Q: JacobianPoints) -> JacobianPoints:
    return JacobianPoints(
        fp.select(mask, P.x, Q.x), fp.select(mask, P.y, Q.y), fp.select(mask, P.z, Q.z)
    )


def _select_xyzz(mask, P: XYZZPoints, Q: XYZZPoints) -> XYZZPoints:
    return XYZZPoints(
        fp.select(mask, P.x, Q.x),
        fp.select(mask, P.y, Q.y),
        fp.select(mask, P.zz, Q.zz),
        fp.select(mask, P.zzz, Q.zzz),
    )


@functools.partial(jax.jit, static_argnums=0)
def to_affine(spec: SWCurveSpec, P: JacobianPoints) -> AffinePoints:
    """Batch-normalize Jacobian -> affine via one batched inversion
    (reference: normalize_batch, ec/src/models/short_weierstrass/
    group.rs:302-319)."""
    f = spec.base
    zinv = fp.batch_inv(f, P.z)  # inv(0) = 0 → infinity maps to (0, 0)
    zinv2 = fp.mont_sqr(f, zinv)
    x = fp.mont_mul(f, P.x, zinv2)
    y = fp.mont_mul(f, P.y, fp.mont_mul(f, zinv, zinv2))
    return AffinePoints(x, y, jac_is_inf(P))


@functools.partial(jax.jit, static_argnums=0)
def xyzz_to_affine(spec: SWCurveSpec, P: XYZZPoints) -> AffinePoints:
    f = spec.base
    x = fp.mont_mul(f, P.x, fp.batch_inv(f, P.zz))
    y = fp.mont_mul(f, P.y, fp.batch_inv(f, P.zzz))
    return AffinePoints(x, y, xyzz_is_inf(P))


# ---------------------------------------------------------------------------
# Jacobian formulas (EFD names as in the reference group.rs:160-267,332+)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def jac_double(spec: SWCurveSpec, P: JacobianPoints) -> JacobianPoints:
    """Doubling; complete for infinity and 2-torsion (both give z3 = 0).

    a == 0: dbl-2009-l (reference group.rs:160-200);
    general a: dbl-2007-bl (group.rs:201-267).
    """
    f = spec.base
    X1, Y1, Z1 = P
    if spec.a_is_zero:
        A = fp.mont_sqr(f, X1)
        B = fp.mont_sqr(f, Y1)
        C = fp.mont_sqr(f, B)
        # D = 2((X1+B)^2 - A - C)
        D = fp.double(f, fp.sub(f, fp.sub(f, fp.mont_sqr(f, fp.add(f, X1, B)), A), C))
        E = fp.add(f, fp.double(f, A), A)  # 3A
        F = fp.mont_sqr(f, E)
        X3 = fp.sub(f, F, fp.double(f, D))
        Y3 = fp.sub(f, fp.mont_mul(f, E, fp.sub(f, D, X3)), fp.double(f, fp.double(f, fp.double(f, C))))
        Z3 = fp.double(f, fp.mont_mul(f, Y1, Z1))
        return JacobianPoints(X3, Y3, Z3)
    XX = fp.mont_sqr(f, X1)
    YY = fp.mont_sqr(f, Y1)
    YYYY = fp.mont_sqr(f, YY)
    ZZ = fp.mont_sqr(f, Z1)
    S = fp.double(f, fp.sub(f, fp.sub(f, fp.mont_sqr(f, fp.add(f, X1, YY)), XX), YYYY))
    a_c = fp.const_array(f, spec.a_int, ())
    M = fp.add(f, fp.add(f, fp.double(f, XX), XX), fp.mont_mul(f, a_c, fp.mont_sqr(f, ZZ)))
    X3 = fp.sub(f, fp.mont_sqr(f, M), fp.double(f, S))
    Y3 = fp.sub(
        f,
        fp.mont_mul(f, M, fp.sub(f, S, X3)),
        fp.double(f, fp.double(f, fp.double(f, YYYY))),
    )
    Z3 = fp.sub(f, fp.sub(f, fp.mont_sqr(f, fp.add(f, Y1, Z1)), YY), ZZ)
    return JacobianPoints(X3, Y3, Z3)


@functools.partial(jax.jit, static_argnums=0)
def jac_add(spec: SWCurveSpec, P: JacobianPoints, Q: JacobianPoints) -> JacobianPoints:
    """Full Jacobian addition add-2007-bl with branchless edge handling
    (reference group.rs:332+ branches; here: compute {add, double, ∞, P, Q}
    candidates and mask-select)."""
    f = spec.base
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = fp.mont_sqr(f, Z1)
    Z2Z2 = fp.mont_sqr(f, Z2)
    U1 = fp.mont_mul(f, X1, Z2Z2)
    U2 = fp.mont_mul(f, X2, Z1Z1)
    S1 = fp.mont_mul(f, Y1, fp.mont_mul(f, Z2, Z2Z2))
    S2 = fp.mont_mul(f, Y2, fp.mont_mul(f, Z1, Z1Z1))
    H = fp.sub(f, U2, U1)
    r = fp.double(f, fp.sub(f, S2, S1))
    I = fp.mont_sqr(f, fp.double(f, H))
    J = fp.mont_mul(f, H, I)
    V = fp.mont_mul(f, U1, I)
    X3 = fp.sub(f, fp.sub(f, fp.mont_sqr(f, r), J), fp.double(f, V))
    Y3 = fp.sub(
        f,
        fp.mont_mul(f, r, fp.sub(f, V, X3)),
        fp.double(f, fp.mont_mul(f, S1, J)),
    )
    Z3 = fp.mont_mul(
        f, fp.sub(f, fp.sub(f, fp.mont_sqr(f, fp.add(f, Z1, Z2)), Z1Z1), Z2Z2), H
    )
    R = JacobianPoints(X3, Y3, Z3)
    # edge cases
    h0 = fp.is_zero(f, H)
    r0 = fp.is_zero(f, r)
    p_inf = jac_is_inf(P)
    q_inf = jac_is_inf(Q)
    both = ~p_inf & ~q_inf
    R = _select_jac(both & h0 & r0, jac_double(spec, P), R)  # P == Q
    R = _select_jac(both & h0 & ~r0, jac_zero(spec, X1.shape[1:]), R)  # P == -Q
    R = _select_jac(p_inf, Q, R)
    R = _select_jac(q_inf, P, R)
    return R


@functools.partial(jax.jit, static_argnums=0)
def jac_add_mixed(spec: SWCurveSpec, P: JacobianPoints, A: AffinePoints) -> JacobianPoints:
    """Mixed add madd-2007-bl (Z2 = 1), branchless (reference group.rs:
    AddAssign<&Affine>)."""
    f = spec.base
    X1, Y1, Z1 = P
    X2, Y2 = A.x, A.y
    Z1Z1 = fp.mont_sqr(f, Z1)
    U2 = fp.mont_mul(f, X2, Z1Z1)
    S2 = fp.mont_mul(f, Y2, fp.mont_mul(f, Z1, Z1Z1))
    H = fp.sub(f, U2, X1)
    r = fp.double(f, fp.sub(f, S2, Y1))
    HH = fp.mont_sqr(f, H)
    I = fp.double(f, fp.double(f, HH))
    J = fp.mont_mul(f, H, I)
    V = fp.mont_mul(f, X1, I)
    X3 = fp.sub(f, fp.sub(f, fp.mont_sqr(f, r), J), fp.double(f, V))
    Y3 = fp.sub(
        f, fp.mont_mul(f, r, fp.sub(f, V, X3)), fp.double(f, fp.mont_mul(f, Y1, J))
    )
    Z3 = fp.sub(f, fp.sub(f, fp.mont_sqr(f, fp.add(f, Z1, H)), Z1Z1), HH)
    R = JacobianPoints(X3, Y3, Z3)
    h0 = fp.is_zero(f, H)
    r0 = fp.is_zero(f, r)
    p_inf = jac_is_inf(P)
    both = ~p_inf & ~A.inf
    R = _select_jac(both & h0 & r0, jac_double(spec, P), R)
    R = _select_jac(both & h0 & ~r0, jac_zero(spec, X1.shape[1:]), R)
    R = _select_jac(p_inf, from_affine(spec, A), R)
    R = _select_jac(A.inf, P, R)
    return R


def jac_neg(spec: SWCurveSpec, P: JacobianPoints) -> JacobianPoints:
    return JacobianPoints(P.x, fp.neg(spec.base, P.y), P.z)


# ---------------------------------------------------------------------------
# XYZZ ("Bucket") formulas — reference bucket.rs; EFD xyzz coordinates
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def xyzz_add_affine(spec: SWCurveSpec, P: XYZZPoints, A: AffinePoints) -> XYZZPoints:
    """Bucket += affine point (mmadd-xyzz), the MSM inner loop
    (reference: Bucket::AddAssign<&Affine>, bucket.rs). On TPU, a fused
    Pallas kernel (zkarray/kernels/sw.py) evaluates the whole formula; the
    XLA path below is the bit-identical portable fallback."""
    from zkarray import kernels as _k

    if _k.use_pallas(P.x.shape[1:]):
        from zkarray.kernels import sw as _ksw

        return _ksw.xyzz_add_affine(spec, P, A)
    f = spec.base
    X1, Y1, ZZ1, ZZZ1 = P
    U2 = fp.mont_mul(f, A.x, ZZ1)
    S2 = fp.mont_mul(f, A.y, ZZZ1)
    Pp = fp.sub(f, U2, X1)
    R = fp.sub(f, S2, Y1)
    PP = fp.mont_sqr(f, Pp)
    PPP = fp.mont_mul(f, Pp, PP)
    Q = fp.mont_mul(f, X1, PP)
    X3 = fp.sub(f, fp.sub(f, fp.mont_sqr(f, R), PPP), fp.double(f, Q))
    Y3 = fp.sub(
        f, fp.mont_mul(f, R, fp.sub(f, Q, X3)), fp.mont_mul(f, Y1, PPP)
    )
    ZZ3 = fp.mont_mul(f, ZZ1, PP)
    ZZZ3 = fp.mont_mul(f, ZZZ1, PPP)
    out = XYZZPoints(X3, Y3, ZZ3, ZZZ3)
    p0 = fp.is_zero(f, Pp)
    r0 = fp.is_zero(f, R)
    p_inf = xyzz_is_inf(P)
    both = ~p_inf & ~A.inf
    out = _select_xyzz(both & p0 & r0, xyzz_double_affine(spec, A), out)
    out = _select_xyzz(both & p0 & ~r0, xyzz_zero(spec, X1.shape[1:]), out)
    out = _select_xyzz(p_inf, xyzz_from_affine(spec, A), out)
    out = _select_xyzz(A.inf, P, out)
    return out


def xyzz_from_affine(spec: SWCurveSpec, A: AffinePoints) -> XYZZPoints:
    f = spec.base
    batch = A.x.shape[1:]
    one_ = fp.one(f, batch)
    z = fp.select(A.inf, fp.zero(f, batch), one_)
    return XYZZPoints(A.x, A.y, z, z)


@functools.partial(jax.jit, static_argnums=0)
def xyzz_double_affine(spec: SWCurveSpec, A: AffinePoints) -> XYZZPoints:
    """2·affine in XYZZ (mdbl-2008-s-1); used for the P == Q bucket edge.
    General a supported via a·1 term; complete for infinity/2-torsion."""
    f = spec.base
    X1, Y1 = A.x, A.y
    U = fp.double(f, Y1)
    V = fp.mont_sqr(f, U)
    W = fp.mont_mul(f, U, V)
    S = fp.mont_mul(f, X1, V)
    XX = fp.mont_sqr(f, X1)
    M = fp.add(f, fp.double(f, XX), XX)
    if not spec.a_is_zero:
        M = fp.add(f, M, fp.const_array(f, spec.a_int, ()))
    X3 = fp.sub(f, fp.mont_sqr(f, M), fp.double(f, S))
    Y3 = fp.sub(f, fp.mont_mul(f, M, fp.sub(f, S, X3)), fp.mont_mul(f, W, Y1))
    out = XYZZPoints(X3, Y3, V, W)
    # infinity or y == 0 (2-torsion) → infinity
    bad = A.inf | fp.is_zero(f, Y1)
    return _select_xyzz(bad, xyzz_zero(spec, X1.shape[1:]), out)


@functools.partial(jax.jit, static_argnums=0)
def xyzz_add(spec: SWCurveSpec, P: XYZZPoints, Q: XYZZPoints) -> XYZZPoints:
    """Full XYZZ + XYZZ (add-2008-s; reference bucket.rs Add<Bucket>)."""
    f = spec.base
    X1, Y1, ZZ1, ZZZ1 = P
    X2, Y2, ZZ2, ZZZ2 = Q
    U1 = fp.mont_mul(f, X1, ZZ2)
    U2 = fp.mont_mul(f, X2, ZZ1)
    S1 = fp.mont_mul(f, Y1, ZZZ2)
    S2 = fp.mont_mul(f, Y2, ZZZ1)
    Pp = fp.sub(f, U2, U1)
    R = fp.sub(f, S2, S1)
    PP = fp.mont_sqr(f, Pp)
    PPP = fp.mont_mul(f, Pp, PP)
    Q_ = fp.mont_mul(f, U1, PP)
    X3 = fp.sub(f, fp.sub(f, fp.mont_sqr(f, R), PPP), fp.double(f, Q_))
    Y3 = fp.sub(f, fp.mont_mul(f, R, fp.sub(f, Q_, X3)), fp.mont_mul(f, S1, PPP))
    ZZ3 = fp.mont_mul(f, fp.mont_mul(f, ZZ1, ZZ2), PP)
    ZZZ3 = fp.mont_mul(f, fp.mont_mul(f, ZZZ1, ZZZ2), PPP)
    out = XYZZPoints(X3, Y3, ZZ3, ZZZ3)
    p0 = fp.is_zero(f, Pp)
    r0 = fp.is_zero(f, R)
    p_inf = xyzz_is_inf(P)
    q_inf = xyzz_is_inf(Q)
    both = ~p_inf & ~q_inf
    out = _select_xyzz(both & p0 & r0, xyzz_double(spec, P), out)
    out = _select_xyzz(both & p0 & ~r0, xyzz_zero(spec, X1.shape[1:]), out)
    out = _select_xyzz(p_inf, Q, out)
    out = _select_xyzz(q_inf, P, out)
    return out


@functools.partial(jax.jit, static_argnums=0)
def xyzz_double(spec: SWCurveSpec, P: XYZZPoints) -> XYZZPoints:
    """dbl-2008-s-1 in XYZZ; complete for infinity/2-torsion."""
    f = spec.base
    X1, Y1, ZZ1, ZZZ1 = P
    U = fp.double(f, Y1)
    V = fp.mont_sqr(f, U)
    W = fp.mont_mul(f, U, V)
    S = fp.mont_mul(f, X1, V)
    XX = fp.mont_sqr(f, X1)
    M = fp.add(f, fp.double(f, XX), XX)
    if not spec.a_is_zero:
        a_c = fp.const_array(f, spec.a_int, ())
        M = fp.add(f, M, fp.mont_mul(f, a_c, fp.mont_sqr(f, ZZ1)))
    X3 = fp.sub(f, fp.mont_sqr(f, M), fp.double(f, S))
    Y3 = fp.sub(f, fp.mont_mul(f, M, fp.sub(f, S, X3)), fp.mont_mul(f, W, Y1))
    ZZ3 = fp.mont_mul(f, V, ZZ1)
    ZZZ3 = fp.mont_mul(f, W, ZZZ1)
    out = XYZZPoints(X3, Y3, ZZ3, ZZZ3)
    bad = xyzz_is_inf(P) | fp.is_zero(f, Y1)
    return _select_xyzz(bad, xyzz_zero(spec, X1.shape[1:]), out)


# ---------------------------------------------------------------------------
# curve predicates & scalar multiplication
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def is_on_curve(spec: SWCurveSpec, A: AffinePoints) -> jnp.ndarray:
    """y^2 == x^3 + a x + b (infinity counts as on-curve); reference
    affine.rs:146."""
    f = spec.base
    y2 = fp.mont_sqr(f, A.y)
    x3 = fp.mont_mul(f, fp.mont_sqr(f, A.x), A.x)
    rhs = fp.add(f, x3, fp.const_array(f, spec.b_int, A.x.shape[1:]))
    if not spec.a_is_zero:
        rhs = fp.add(f, rhs, fp.mont_mul(f, fp.const_array(f, spec.a_int, ()), A.x))
    return fp.eq(y2, rhs) | A.inf


@functools.partial(jax.jit, static_argnums=0)
def scalar_mul(spec: SWCurveSpec, A: AffinePoints, scalars: jnp.ndarray) -> JacobianPoints:
    """Per-element k_i · P_i, double-and-add over scalar bits (MSB first).

    ``scalars``: canonical (not Montgomery) scalar-field limbs (Ls, *batch).
    Reference: mul_bigint / sw_double_and_add_affine (ec/src/models/
    short_weierstrass/mod.rs:101-119, ec/src/lib.rs).
    """
    nbits = spec.scalar.num_limbs * 16
    batch = A.x.shape[1:]
    acc0 = jac_zero(spec, batch)
    limb_tab = jnp.asarray(
        np.asarray([(nbits - 1 - i) // 16 for i in range(nbits)], dtype=np.int32)
    )
    shift_tab = jnp.asarray(
        np.asarray([(nbits - 1 - i) % 16 for i in range(nbits)], dtype=np.int32)
    )

    def scan_body(acc, ls):
        limb, shift = ls
        row = jnp.take(scalars, limb, axis=0)
        bit = (row >> shift) & 1
        acc = jac_double(spec, acc)
        added = jac_add_mixed(spec, acc, A)
        return _select_jac(bit == 1, added, acc), None

    acc, _ = jax.lax.scan(scan_body, acc0, (limb_tab, shift_tab))
    return acc


@functools.partial(jax.jit, static_argnums=(0, 2))
def scalar_mul_const(spec: SWCurveSpec, P: JacobianPoints, k: int) -> JacobianPoints:
    """k · P for a Python-int constant k (e.g. cofactor clearing;
    reference: mul_by_cofactor, ec/src/lib.rs:160-180). Scan-compressed:
    the graph holds one double+add body regardless of |k|."""
    if k == 0:
        return jac_zero(spec, P.x.shape[1:])
    neg_ = k < 0
    k = abs(k)
    bits = jnp.asarray(
        np.asarray([int(b) for b in bin(k)[2:]], dtype=np.uint32)
    )

    def body(acc, bit):
        acc = jac_double(spec, acc)
        added = jac_add(spec, acc, P)
        return _select_jac(bit == 1, added, acc), None

    acc, _ = jax.lax.scan(body, jac_zero(spec, P.x.shape[1:]), bits)
    return jac_neg(spec, acc) if neg_ else acc


def clear_cofactor(spec: SWCurveSpec, A: AffinePoints) -> JacobianPoints:
    return scalar_mul_const(spec, from_affine(spec, A), spec.cofactor)


@functools.partial(jax.jit, static_argnums=0)
def subgroup_check(spec: SWCurveSpec, A: AffinePoints) -> jnp.ndarray:
    """Generic check r·P == ∞ (curve-specific fast paths can override;
    reference mod.rs:102-110)."""
    r = spec.scalar.modulus
    res = scalar_mul_const(spec, from_affine(spec, A), r)
    return jac_is_inf(res)
