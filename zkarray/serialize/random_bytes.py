"""Sampling field/group elements from raw (hash/RNG) bytes.

Reference: ``Field::from_random_bytes_with_flags`` / ``from_random_bytes``
(ff/src/fields/models/fp/mod.rs:252-296, ff/src/fields/mod.rs:247-257) and
``AffineRepr::from_random_bytes`` (ec/src/models/short_weierstrass/
affine.rs:264-277, twisted_edwards/affine.rs:177-180).

Exact semantics mirrored:
* the value is the little-endian integer of the input bytes with every bit
  at position >= MODULUS_BIT_SIZE cleared; candidates >= p are invalid;
* flags are read from byte ``buffer_byte_size(bits + flag_bits) - 1`` of the
  ORIGINAL input (before masking), from its top ``flag_bits`` bits;
* SW points: infinity flag with x == 0 -> identity; infinity with x != 0 or
  both flags set -> invalid; otherwise y is the GREATER root iff the
  negative-flag bit is clear (the reference passes ``y_is_positive`` as
  ``greatest`` — from_random_bytes is a sampling aid, deliberately not the
  serialization convention); no subgroup check (get_point_from_x_unchecked);
* TE points: x is the greater root iff the x-negative flag is SET
  (get_point_from_y_unchecked(y, flags.is_negative())).

Host-side boundary code (batched numpy), like serialize/canonical.py.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from zkarray.core.fieldspec import FieldSpec
from zkarray.ec.point_serde import _y_is_negative
from zkarray.ec.sw import AffinePoints, SWCurveSpec
from zkarray.ec.te import TEAffine, TECurveSpec
from zkarray.ff import fp
from zkarray.serialize.canonical import (
    SW_FLAG_INFINITY,
    SW_FLAG_NEGATIVE,
    TE_FLAG_NEGATIVE,
    _bytes_to_limbs,
    field_byte_size,
)


def field_from_random_bytes(
    spec: FieldSpec, data: np.ndarray, flag_bits: int = 0
) -> Tuple[jnp.ndarray, np.ndarray, np.ndarray]:
    """(n, k) LE bytes -> (Montgomery field array (L, n), flags (n,), ok (n,)).

    ``ok`` is False where the masked candidate is >= p (the reference
    returns None there). Any byte length k is accepted; bytes beyond the
    limb buffer are ignored (reference copies into a zeroed SerBuffer).
    """
    if flag_bits > 8:
        raise ValueError("flags must fit one byte (Flags::BIT_SIZE <= 8)")
    data = np.asarray(data, dtype=np.uint8)
    if data.ndim == 1:
        data = data[None]
    n, k = data.shape
    # 64-bit limb geometry of the reference decides the buffer span
    n64 = (spec.bits + 63) // 64
    span = 8 * n64
    buf = np.zeros((n, span), dtype=np.uint8)
    buf[:, : min(k, span)] = data[:, : min(k, span)]

    flags = np.zeros(n, dtype=np.uint8)
    if flag_bits:
        flags_mask = (0xFF << (8 - flag_bits)) & 0xFF
        flag_loc = field_byte_size(spec, flag_bits) - 1
        if flag_loc < k:
            flags = (data[:, flag_loc] & flags_mask).astype(np.uint8)

    # clear every bit at position >= MODULUS_BIT_SIZE
    top_byte, top_bit = spec.bits // 8, spec.bits % 8
    if top_byte < span:
        buf[:, top_byte] &= (1 << top_bit) - 1
        buf[:, top_byte + 1 :] = 0

    limbs = _bytes_to_limbs(spec, buf)  # canonical (L, n)
    p_limbs = np.array(
        [(spec.modulus >> (16 * i)) & 0xFFFF for i in range(spec.num_limbs)],
        dtype=np.uint32,
    )
    # lexicographic (most-significant-first) comparison: value < p
    lt = np.zeros(n, dtype=bool)
    decided = np.zeros(n, dtype=bool)
    for i in range(spec.num_limbs - 1, -1, -1):
        lt |= ~decided & (limbs[i] < p_limbs[i])
        decided |= limbs[i] != p_limbs[i]
    ok = lt
    return fp.to_mont(spec, jnp.asarray(limbs)), flags, ok


def sw_from_random_bytes(
    curve: SWCurveSpec, data: np.ndarray
) -> Tuple[AffinePoints, np.ndarray]:
    """(n, k) bytes -> (points, ok). Mirrors SW AffineRepr::from_random_bytes
    (ec/src/models/short_weierstrass/affine.rs:264-277): on-curve via sqrt
    existence, NO subgroup check."""
    f = curve.base
    x, flags, okf = field_from_random_bytes(f, data, flag_bits=2)
    n = x.shape[1]
    is_inf = (flags & SW_FLAG_INFINITY) != 0
    neg = (flags & SW_FLAG_NEGATIVE) != 0
    bad_flags = is_inf & neg  # SWFlags::from_u8 -> None
    x_zero = np.asarray(fp.is_zero(f, x))
    identity = is_inf & x_zero & ~neg

    # y² = x³ + ax + b ; greatest root iff "positive" flag (no negative bit)
    rhs = fp.add(
        f, fp.mont_mul(f, fp.mont_sqr(f, x), x), fp.const_array(f, curve.b_int, (n,))
    )
    if not curve.a_is_zero:
        rhs = fp.add(f, rhs, fp.mont_mul(f, fp.const_array(f, curve.a_int, ()), x))
    root, is_sq = fp.sqrt(f, rhs)
    root_neg = fp.neg(f, root)
    root_is_larger = _y_is_negative(f, root)
    y_small = fp.select(jnp.asarray(root_is_larger), root_neg, root)
    y_large = fp.neg(f, y_small)
    greatest = ~neg  # y_is_positive passed as `greatest` in the reference
    y = fp.select(jnp.asarray(greatest), y_large, y_small)

    pts = AffinePoints(
        fp.select(jnp.asarray(identity), fp.zero(f, (n,)), x),
        fp.select(jnp.asarray(identity), fp.zero(f, (n,)), y),
        jnp.asarray(identity),
    )
    ok = okf & ~bad_flags & (identity | (~is_inf & np.asarray(is_sq)))
    return pts, ok


def te_from_random_bytes(
    curve: TECurveSpec, data: np.ndarray
) -> Tuple[TEAffine, np.ndarray]:
    """(n, k) bytes -> (points, ok). Mirrors TE AffineRepr::from_random_bytes
    (ec/src/models/twisted_edwards/affine.rs:177-180): y from bytes, x the
    greater root iff the negative flag is set; no subgroup check."""
    f = curve.base
    y, flags, okf = field_from_random_bytes(f, data, flag_bits=1)
    neg = (flags & TE_FLAG_NEGATIVE) != 0
    y2 = fp.mont_sqr(f, y)
    num = fp.sub(f, y2, fp.one(f, y2.shape[1:]))
    den = fp.sub(
        f,
        fp.mont_mul(f, fp.const_array(f, curve.d_int, ()), y2),
        fp.const_array(f, curve.a_int, y2.shape[1:]),
    )
    # d*y^2 - a == 0 has no inverse: the reference's get_point_from_y_unchecked
    # returns None there (inverse() fails); batch_inv maps 0 -> 0, which would
    # otherwise let (0, y) through as a fake square — mask those rows invalid.
    den_ok = ~np.asarray(fp.is_zero(f, den))
    x2 = fp.mont_mul(f, num, fp.batch_inv(f, den))
    root, is_sq = fp.sqrt(f, x2)
    root_neg = fp.neg(f, root)
    larger = _y_is_negative(f, root)
    x_small = fp.select(jnp.asarray(larger), root_neg, root)
    x_large = fp.neg(f, x_small)
    x = fp.select(jnp.asarray(neg), x_large, x_small)
    return TEAffine(x, y), okf & den_ok & np.asarray(is_sq)
