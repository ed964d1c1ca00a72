"""Double-odd curves: y² = x(x² + ax + b) in (e, u) coordinates.

Reference analog: ark-ec's double_odd model (ec/src/models/double_odd/
{mod.rs:22-120, affine.rs, group.rs}), implementing the jq255-style groups of
doubleodd.group. A group element is the pair {P, P+N} (N the 2-torsion point);
the affine representation is (e, u) with identity (1, 0), and the projective
representation is fractional (E : Z : U : T) with e = E/Z, u = U/Z,
T = U²/Z. The addition/doubling formulas (Algorithm 3 of doubleodd-jq.pdf,
reference group.rs:176-348) are COMPLETE — they handle the identity without
branches, which makes this model fully mask-free on TPU, like Twisted
Edwards extended coordinates.

Curve constant c = a² - 4b (reference mod.rs get_c).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.core.fieldspec import FieldSpec
from zkarray.ff import fp


class DOAffine(NamedTuple):
    e: jnp.ndarray
    u: jnp.ndarray  # identity = (1, 0); no infinity flag needed


class DOProjective(NamedTuple):
    e: jnp.ndarray
    z: jnp.ndarray
    u: jnp.ndarray
    t: jnp.ndarray  # T = U²/Z


class DOCurveSpec:
    def __init__(
        self,
        name: str,
        base: FieldSpec,
        scalar: FieldSpec,
        a: int,
        b: int,
        gen_e: int,
        gen_u: int,
        cofactor: int = 2,
    ):
        self.name = name
        self.base = base
        self.scalar = scalar
        p = base.modulus
        self.a_int = a % p
        self.b_int = b % p
        self.c_int = (self.a_int * self.a_int - 4 * self.b_int) % p
        self.gen_e = gen_e % p
        self.gen_u = gen_u % p
        self.cofactor = cofactor
        self.cofactor_inv = pow(cofactor, -1, scalar.modulus)

    def __hash__(self):
        return hash((self.name, self.base, self.a_int, self.b_int))

    def __eq__(self, o):
        return isinstance(o, DOCurveSpec) and (o.name, o.a_int, o.b_int) == (
            self.name,
            self.a_int,
            self.b_int,
        )

    def __repr__(self):
        return f"DOCurveSpec({self.name})"

    def generator(self, batch_shape=()) -> DOAffine:
        return DOAffine(
            fp.const_array(self.base, self.gen_e, batch_shape),
            fp.const_array(self.base, self.gen_u, batch_shape),
        )

    def affine_from_ints(self, eus) -> DOAffine:
        return DOAffine(
            fp.from_ints(self.base, [p[0] for p in eus]),
            fp.from_ints(self.base, [p[1] for p in eus]),
        )

    def affine_to_ints(self, pts: DOAffine):
        return list(
            zip(fp.to_ints(self.base, pts.e), fp.to_ints(self.base, pts.u))
        )


def zero(spec: DOCurveSpec, batch_shape=()) -> DOProjective:
    """Identity representant O = (1 : 1 : 0 : 0) (reference group.rs Zero)."""
    f = spec.base
    one = fp.one(f, batch_shape)
    z = fp.zero(f, batch_shape)
    return DOProjective(one, one, z, z)


def from_affine(spec: DOCurveSpec, A: DOAffine) -> DOProjective:
    f = spec.base
    batch = A.e.shape[1:]
    return DOProjective(A.e, fp.one(f, batch), A.u, fp.mont_sqr(f, A.u))


def is_zero(spec: DOCurveSpec, P: DOProjective) -> jnp.ndarray:
    """U = 0 identifies both identity representants (group.rs is_zero)."""
    return fp.is_zero(spec.base, P.u)


def _mul_a(spec, x):
    f = spec.base
    if spec.a_int == f.modulus - 1:
        return fp.neg(f, x)
    if spec.a_int == 0:
        return fp.zero(f, x.shape[1:])
    return fp.mont_mul(f, fp.const_array(f, spec.a_int, ()), x)


def _mul_c(spec, x):
    return fp.mont_mul(
        spec.base, fp.const_array(spec.base, spec.c_int, ()), x
    )


@functools.partial(jax.jit, static_argnums=0)
def double(spec: DOCurveSpec, P: DOProjective) -> DOProjective:
    """Extended-coordinate doubling (doubleodd.group formulas-eu, reference
    group.rs double_in_place). Complete."""
    f = spec.base
    ee = fp.mont_sqr(f, P.e)
    w = fp.sub(
        f,
        fp.add(f, ee, fp.double(f, _mul_a(spec, fp.mont_sqr(f, P.u)))),
        fp.double(f, _mul_c(spec, fp.mont_sqr(f, P.t))),
    )  # W' = E² + 2aU² - 2cT²
    j = fp.double(f, fp.mont_mul(f, P.e, P.u))  # J' = 2EU
    t2 = fp.mont_sqr(f, j)  # T' = J'²
    u2 = fp.mont_mul(f, j, w)  # U' = J'W'
    z2 = fp.mont_sqr(f, w)  # Z' = W'²
    x2 = fp.double(f, fp.mont_sqr(f, ee))  # 2X' = 2E⁴
    e2 = fp.add(f, fp.sub(f, x2, z2), _mul_a(spec, t2))  # E' = 2X' - Z' + aT'
    return DOProjective(e2, z2, u2, t2)


@functools.partial(jax.jit, static_argnums=0)
def add(spec: DOCurveSpec, P: DOProjective, Q: DOProjective) -> DOProjective:
    """Complete projective addition (Algorithm 3, doubleodd-jq.pdf;
    reference group.rs AddAssign<&Self>)."""
    f = spec.base
    n1 = fp.mont_mul(f, P.e, Q.e)
    n2 = fp.mont_mul(f, P.z, Q.z)
    n3 = fp.mont_mul(f, P.u, Q.u)
    n4 = fp.mont_mul(f, P.t, Q.t)
    n5 = fp.sub(
        f,
        fp.sub(
            f,
            fp.mont_mul(f, fp.add(f, P.z, P.t), fp.add(f, Q.z, Q.t)),
            n2,
        ),
        n4,
    )
    n6 = fp.sub(
        f,
        fp.sub(
            f,
            fp.mont_mul(f, fp.add(f, P.e, P.u), fp.add(f, Q.e, Q.u)),
            n1,
        ),
        n3,
    )
    cn4 = _mul_c(spec, n4)
    n7 = fp.sub(f, n2, cn4)
    n3d = fp.double(f, n3)
    e = fp.add(
        f,
        fp.mont_mul(f, fp.add(f, n2, cn4), fp.sub(f, n1, _mul_a(spec, n3d))),
        _mul_c(spec, fp.mont_mul(f, n3d, n5)),
    )
    return DOProjective(
        e, fp.mont_sqr(f, n7), fp.mont_mul(f, n7, n6), fp.mont_sqr(f, n6)
    )


@functools.partial(jax.jit, static_argnums=0)
def add_mixed(spec: DOCurveSpec, P: DOProjective, A2: DOAffine) -> DOProjective:
    """Mixed addition (Z2 = 1, T2 = u2²; reference group.rs AddAssign<Affine>)."""
    f = spec.base
    ot = fp.mont_sqr(f, A2.u)
    n1 = fp.mont_mul(f, P.e, A2.e)
    n2 = P.z
    n3 = fp.mont_mul(f, P.u, A2.u)
    n4 = fp.mont_mul(f, P.t, ot)
    n5 = fp.add(f, fp.mont_mul(f, P.z, ot), P.t)
    n6 = fp.sub(
        f,
        fp.sub(
            f,
            fp.mont_mul(f, fp.add(f, P.e, P.u), fp.add(f, A2.e, A2.u)),
            n1,
        ),
        n3,
    )
    cn4 = _mul_c(spec, n4)
    n7 = fp.sub(f, n2, cn4)
    n3d = fp.double(f, n3)
    e = fp.add(
        f,
        fp.mont_mul(f, fp.add(f, n2, cn4), fp.sub(f, n1, _mul_a(spec, n3d))),
        _mul_c(spec, fp.mont_mul(f, n3d, n5)),
    )
    return DOProjective(
        e, fp.mont_sqr(f, n7), fp.mont_mul(f, n7, n6), fp.mont_sqr(f, n6)
    )


def neg(spec: DOCurveSpec, P: DOProjective) -> DOProjective:
    return DOProjective(P.e, P.z, fp.neg(spec.base, P.u), P.t)


def neg_affine(spec: DOCurveSpec, A: DOAffine) -> DOAffine:
    return DOAffine(A.e, fp.neg(spec.base, A.u))


def _sel(mask, P: DOProjective, Q: DOProjective) -> DOProjective:
    return DOProjective(*(fp.select(mask, a, b) for a, b in zip(P, Q)))


@functools.partial(jax.jit, static_argnums=0)
def to_affine(spec: DOCurveSpec, P: DOProjective) -> DOAffine:
    """Batch-normalize (reference group.rs normalize_batch): identity has
    Z ≠ 0 so a single batch inversion suffices; identity maps to (1, 0)."""
    f = spec.base
    zinv = fp.batch_inv(f, P.z)
    e = fp.mont_mul(f, P.e, zinv)
    u = fp.mont_mul(f, P.u, zinv)
    idm = is_zero(spec, P)
    return DOAffine(
        fp.select(idm, fp.one(f, e.shape[1:]), e),
        fp.select(idm, fp.zero(f, u.shape[1:]), u),
    )


@functools.partial(jax.jit, static_argnums=0)
def is_on_curve(spec: DOCurveSpec, A: DOAffine) -> jnp.ndarray:
    """e² == c·u⁴ - 2a·u² + 1 (reference affine.rs is_on_curve)."""
    f = spec.base
    u2 = fp.mont_sqr(f, A.u)
    rhs = fp.add(
        f,
        fp.sub(f, _mul_c(spec, fp.mont_sqr(f, u2)), fp.double(f, _mul_a(spec, u2))),
        fp.one(f, A.e.shape[1:]),
    )
    return fp.eq(fp.mont_sqr(f, A.e), rhs)


@functools.partial(jax.jit, static_argnums=0)
def get_e_from_u(spec: DOCurveSpec, u: jnp.ndarray):
    """e = sqrt(c·u⁴ - 2a·u² + 1) (reference affine.rs get_e_from_u).
    Returns (e, ok_mask)."""
    f = spec.base
    u2 = fp.mont_sqr(f, u)
    rhs = fp.add(
        f,
        fp.sub(f, _mul_c(spec, fp.mont_sqr(f, u2)), fp.double(f, _mul_a(spec, u2))),
        fp.one(f, u.shape[1:]),
    )
    return fp.sqrt(f, rhs)


@functools.partial(jax.jit, static_argnums=0)
def scalar_mul(spec: DOCurveSpec, A: DOAffine, scalars: jnp.ndarray) -> DOProjective:
    """Per-element k_i · P_i, canonical scalar limbs (Ls, *batch).

    Double-and-add with complete mixed additions (reference mod.rs
    mul_affine → scalar_mul::double_and_add_affine)."""
    nbits = spec.scalar.num_limbs * 16
    batch = A.e.shape[1:]
    limb_tab = jnp.asarray(
        np.asarray([(nbits - 1 - i) // 16 for i in range(nbits)], dtype=np.int32)
    )
    shift_tab = jnp.asarray(
        np.asarray([(nbits - 1 - i) % 16 for i in range(nbits)], dtype=np.int32)
    )

    def body(acc, ls):
        limb, shift = ls
        bit = (jnp.take(scalars, limb, axis=0) >> shift) & 1
        acc = double(spec, acc)
        added = add_mixed(spec, acc, A)
        return _sel(bit == 1, added, acc), None

    acc, _ = jax.lax.scan(body, zero(spec, batch), (limb_tab, shift_tab))
    return acc


@functools.partial(jax.jit, static_argnums=(0, 2))
def scalar_mul_const(spec: DOCurveSpec, P: DOProjective, k: int) -> DOProjective:
    if k == 0:
        return zero(spec, P.e.shape[1:])
    neg_ = k < 0
    k = abs(k)
    bits = jnp.asarray(np.asarray([int(b) for b in bin(k)[2:]], dtype=np.uint32))

    def body(acc, bit):
        acc = double(spec, acc)
        added = add(spec, acc, P)
        return _sel(bit == 1, added, acc), None

    acc, _ = jax.lax.scan(body, zero(spec, P.e.shape[1:]), bits)
    return neg(spec, acc) if neg_ else acc


def eq_points(spec: DOCurveSpec, P: DOProjective, Q: DOProjective) -> jnp.ndarray:
    """Projective equality e1·u2 == e2·u1 for non-identity (group.rs eq);
    identities compare by the U=0 predicate."""
    f = spec.base
    pz, qz = is_zero(spec, P), is_zero(spec, Q)
    cross = fp.eq(fp.mont_mul(f, P.e, Q.u), fp.mont_mul(f, Q.e, P.u))
    return jnp.where(pz | qz, pz & qz, cross)
