"""Twisted Edwards curves: a·x² + y² = 1 + d·x²·y², extended coordinates.

Reference analog: ark-ec's twisted_edwards model (ec/src/models/
twisted_edwards/{mod.rs:27-60, affine.rs, group.rs}): extended (X, Y, T, Z)
coordinates with the complete add-2008-hwcd formulas — complete addition
means NO edge-case masks at all (identity = (0, 1)), which makes TE curves
the best-behaved TPU citizens of the curve models. Compression: y bytes +
sign-of-x flag (TEFlags).

Also carries the birational Montgomery-form constants (reference
MontCurveConfig) for Elligator2 hashing.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.core.fieldspec import FieldSpec
from zkarray.ff import fp


class TEAffine(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray  # identity = (0, 1); no infinity flag needed


class TEExtended(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    t: jnp.ndarray  # t = x·y/z
    z: jnp.ndarray


class TECurveSpec:
    def __init__(
        self,
        name: str,
        base: FieldSpec,
        scalar: FieldSpec,
        a: int,
        d: int,
        gen_x: int,
        gen_y: int,
        cofactor: int = 1,
        mont_coeff_a: Optional[int] = None,
        mont_coeff_b: Optional[int] = None,
    ):
        self.name = name
        self.base = base
        self.scalar = scalar
        self.a_int = a % base.modulus
        self.d_int = d % base.modulus
        self.gen_x = gen_x
        self.gen_y = gen_y
        self.cofactor = cofactor
        self.mont_coeff_a = mont_coeff_a
        self.mont_coeff_b = mont_coeff_b
        self.a_is_minus_one = self.a_int == base.modulus - 1

    def __hash__(self):
        return hash((self.name, self.base, self.a_int, self.d_int))

    def __eq__(self, o):
        return isinstance(o, TECurveSpec) and (o.name, o.a_int, o.d_int) == (
            self.name,
            self.a_int,
            self.d_int,
        )

    def __repr__(self):
        return f"TECurveSpec({self.name})"

    def generator(self, batch_shape=()) -> TEAffine:
        return TEAffine(
            fp.const_array(self.base, self.gen_x, batch_shape),
            fp.const_array(self.base, self.gen_y, batch_shape),
        )

    def affine_from_ints(self, xys) -> TEAffine:
        return TEAffine(
            fp.from_ints(self.base, [p[0] for p in xys]),
            fp.from_ints(self.base, [p[1] for p in xys]),
        )

    def affine_to_ints(self, pts: TEAffine):
        return list(
            zip(fp.to_ints(self.base, pts.x), fp.to_ints(self.base, pts.y))
        )


def zero(spec: TECurveSpec, batch_shape=()) -> TEExtended:
    f = spec.base
    return TEExtended(
        fp.zero(f, batch_shape),
        fp.one(f, batch_shape),
        fp.zero(f, batch_shape),
        fp.one(f, batch_shape),
    )


def from_affine(spec: TECurveSpec, A: TEAffine) -> TEExtended:
    f = spec.base
    batch = A.x.shape[1:]
    return TEExtended(A.x, A.y, fp.mont_mul(f, A.x, A.y), fp.one(f, batch))


def is_zero(spec: TECurveSpec, P: TEExtended) -> jnp.ndarray:
    # (0 : z : 0 : z) with z != 0
    f = spec.base
    return fp.is_zero(f, P.x) & fp.eq(P.y, P.z)


@functools.partial(jax.jit, static_argnums=0)
def add(spec: TECurveSpec, P: TEExtended, Q: TEExtended) -> TEExtended:
    """Complete extended addition add-2008-hwcd (reference group.rs)."""
    f = spec.base
    A = fp.mont_mul(f, P.x, Q.x)
    B = fp.mont_mul(f, P.y, Q.y)
    C = fp.mont_mul(f, fp.mont_mul(f, P.t, Q.t), fp.const_array(f, spec.d_int, ()))
    D = fp.mont_mul(f, P.z, Q.z)
    E = fp.sub(
        f,
        fp.sub(f, fp.mont_mul(f, fp.add(f, P.x, P.y), fp.add(f, Q.x, Q.y)), A),
        B,
    )
    F = fp.sub(f, D, C)
    G = fp.add(f, D, C)
    aA = fp.neg(f, A) if spec.a_is_minus_one else fp.mont_mul(
        f, fp.const_array(f, spec.a_int, ()), A
    )
    H = fp.sub(f, B, aA)
    return TEExtended(
        fp.mont_mul(f, E, F),
        fp.mont_mul(f, G, H),
        fp.mont_mul(f, E, H),
        fp.mont_mul(f, F, G),
    )


@functools.partial(jax.jit, static_argnums=0)
def add_mixed(spec: TECurveSpec, P: TEExtended, A2: TEAffine) -> TEExtended:
    """Mixed addition (Z2 = 1, T2 = x2·y2)."""
    return add(spec, P, from_affine(spec, A2))


@functools.partial(jax.jit, static_argnums=0)
def double(spec: TECurveSpec, P: TEExtended) -> TEExtended:
    """dbl-2008-hwcd (reference group.rs double_in_place)."""
    f = spec.base
    A = fp.mont_sqr(f, P.x)
    B = fp.mont_sqr(f, P.y)
    C = fp.double(f, fp.mont_sqr(f, P.z))
    aA = fp.neg(f, A) if spec.a_is_minus_one else fp.mont_mul(
        f, fp.const_array(f, spec.a_int, ()), A
    )
    D = aA
    E = fp.sub(
        f, fp.sub(f, fp.mont_sqr(f, fp.add(f, P.x, P.y)), A), B
    )
    G = fp.add(f, D, B)
    F = fp.sub(f, G, C)
    H = fp.sub(f, D, B)
    return TEExtended(
        fp.mont_mul(f, E, F),
        fp.mont_mul(f, G, H),
        fp.mont_mul(f, E, H),
        fp.mont_mul(f, F, G),
    )


def neg(spec: TECurveSpec, P: TEExtended) -> TEExtended:
    f = spec.base
    return TEExtended(fp.neg(f, P.x), P.y, fp.neg(f, P.t), P.z)


def _sel(spec, mask, P: TEExtended, Q: TEExtended) -> TEExtended:
    return TEExtended(
        fp.select(mask, P.x, Q.x),
        fp.select(mask, P.y, Q.y),
        fp.select(mask, P.t, Q.t),
        fp.select(mask, P.z, Q.z),
    )


@functools.partial(jax.jit, static_argnums=0)
def to_affine(spec: TECurveSpec, P: TEExtended) -> TEAffine:
    f = spec.base
    zinv = fp.batch_inv(f, P.z)
    return TEAffine(fp.mont_mul(f, P.x, zinv), fp.mont_mul(f, P.y, zinv))


@functools.partial(jax.jit, static_argnums=0)
def is_on_curve(spec: TECurveSpec, A: TEAffine) -> jnp.ndarray:
    """a·x² + y² == 1 + d·x²·y² (reference affine.rs is_on_curve)."""
    f = spec.base
    x2 = fp.mont_sqr(f, A.x)
    y2 = fp.mont_sqr(f, A.y)
    ax2 = fp.neg(f, x2) if spec.a_is_minus_one else fp.mont_mul(
        f, fp.const_array(f, spec.a_int, ()), x2
    )
    lhs = fp.add(f, ax2, y2)
    rhs = fp.add(
        f,
        fp.one(f, A.x.shape[1:]),
        fp.mont_mul(f, fp.const_array(f, spec.d_int, ()), fp.mont_mul(f, x2, y2)),
    )
    return fp.eq(lhs, rhs)


@functools.partial(jax.jit, static_argnums=0)
def scalar_mul(spec: TECurveSpec, A: TEAffine, scalars: jnp.ndarray) -> TEExtended:
    """Per-element k_i · P_i over canonical scalar limbs (Ls, *batch)."""
    nbits = spec.scalar.num_limbs * 16
    batch = A.x.shape[1:]
    limb_tab = jnp.asarray(
        np.asarray([(nbits - 1 - i) // 16 for i in range(nbits)], dtype=np.int32)
    )
    shift_tab = jnp.asarray(
        np.asarray([(nbits - 1 - i) % 16 for i in range(nbits)], dtype=np.int32)
    )
    Q = from_affine(spec, A)

    def body(acc, ls):
        limb, shift = ls
        bit = (jnp.take(scalars, limb, axis=0) >> shift) & 1
        acc = double(spec, acc)
        added = add(spec, acc, Q)
        return _sel(spec, bit == 1, added, acc), None

    acc, _ = jax.lax.scan(body, zero(spec, batch), (limb_tab, shift_tab))
    return acc


@functools.partial(jax.jit, static_argnums=(0, 2))
def scalar_mul_const(spec: TECurveSpec, P: TEExtended, k: int) -> TEExtended:
    if k == 0:
        return zero(spec, P.x.shape[1:])
    neg_ = k < 0
    k = abs(k)
    bits = jnp.asarray(np.asarray([int(b) for b in bin(k)[2:]], dtype=np.uint32))

    def body(acc, bit):
        acc = double(spec, acc)
        added = add(spec, acc, P)
        return _sel(spec, bit == 1, added, acc), None

    acc, _ = jax.lax.scan(body, zero(spec, P.x.shape[1:]), bits)
    return neg(spec, acc) if neg_ else acc
