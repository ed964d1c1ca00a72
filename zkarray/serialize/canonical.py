"""Canonical serialization — bit-exact with arkworks' wire format.

Reference: ark-serialize's CanonicalSerialize/CanonicalDeserialize traits
(serialize/src/lib.rs:126-242) and ark-ff's field impl (ff/src/fields/models/
fp/mod.rs:552-640): a field element serializes as the little-endian bytes of
its canonical (non-Montgomery) value, truncated to
``ceil((MODULUS_BITS + FLAG_BITS) / 8)`` bytes, with the flag bitmask OR'd
into the top bits of the LAST byte. Flag encodings (serialize/src/flags.rs,
ec/src/models/*/serialization_flags.rs):

  SWFlags   (2 bits): infinity = 1<<6, y-is-negative = 1<<7, positive-y = 0
  TEFlags   (1 bit) : x-is-negative = 1<<7
  EmptyFlags (0 bits)

Host-side boundary code: batched numpy byte fiddling (not a hot path); the
device array converts planar-limb <-> canonical LE bytes here.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from zkarray.core import limbs as lb
from zkarray.core.fieldspec import FieldSpec
from zkarray.ff import fp

EMPTY_FLAGS = 0
SW_FLAG_INFINITY = 1 << 6
SW_FLAG_NEGATIVE = 1 << 7
TE_FLAG_NEGATIVE = 1 << 7


def field_byte_size(spec: FieldSpec, flag_bits: int = 0) -> int:
    """buffer_byte_size(MODULUS_BIT_SIZE + BIT_SIZE) — serialize/src/lib.rs."""
    return (spec.bits + flag_bits + 7) // 8


def _limbs_to_bytes(spec: FieldSpec, canon: np.ndarray, nbytes: int) -> np.ndarray:
    """(L, n) canonical uint32 limbs -> (n, nbytes) LE uint8."""
    L = canon.shape[0]
    n = canon.shape[1] if canon.ndim > 1 else 1
    canon = canon.reshape(L, n).T.astype(np.uint32)  # (n, L)
    out = np.zeros((n, 2 * L), dtype=np.uint8)
    out[:, 0::2] = canon & 0xFF
    out[:, 1::2] = (canon >> 8) & 0xFF
    return np.ascontiguousarray(out[:, :nbytes])


def _bytes_to_limbs(spec: FieldSpec, data: np.ndarray) -> np.ndarray:
    """(n, k) LE uint8 -> (L, n) canonical uint32 limbs (zero-padded)."""
    n, k = data.shape
    L = spec.num_limbs
    buf = np.zeros((n, 2 * L), dtype=np.uint8)
    buf[:, :k] = data
    lo = buf[:, 0::2].astype(np.uint32)
    hi = buf[:, 1::2].astype(np.uint32)
    return np.ascontiguousarray((lo | (hi << 8)).T)  # (L, n)


def serialize_fp(
    spec: FieldSpec,
    a: jnp.ndarray,
    flag_bits: int = 0,
    flags: Optional[np.ndarray] = None,
    mont: bool = True,
) -> np.ndarray:
    """Field array -> (n, nbytes) LE canonical bytes with flags OR'd in.

    ``flags``: per-element uint8 bitmasks (already shifted, e.g.
    SW_FLAG_NEGATIVE); must fit in the top ``flag_bits`` bits.
    """
    if flag_bits > 8:
        raise ValueError("flags must fit one byte (reference: Flags::BIT_SIZE <= 8)")
    canon = np.asarray(fp.from_mont(spec, a) if mont else a)
    L = spec.num_limbs
    flat = canon.reshape(L, -1)
    nbytes = field_byte_size(spec, flag_bits)
    out = _limbs_to_bytes(spec, flat, nbytes)
    if flags is not None:
        out[:, -1] |= np.asarray(flags, dtype=np.uint8).reshape(-1)
    return out


def deserialize_fp(
    spec: FieldSpec,
    data: np.ndarray,
    flag_bits: int = 0,
    mont: bool = True,
    validate: bool = True,
) -> Tuple[jnp.ndarray, np.ndarray, np.ndarray]:
    """(n, nbytes) LE bytes -> (field array (L, n), flags uint8 (n,), valid (n,)).

    Batch-friendly: returns a validity mask rather than raising (the
    reference's Validate::Yes raises; wrap with ``strict``).
    Values >= p are flagged invalid (matching the reference's
    deserialization check).
    """
    data = np.asarray(data, dtype=np.uint8)
    if data.ndim == 1:
        data = data[None]
    nbytes = field_byte_size(spec, flag_bits)
    if data.shape[1] != nbytes:
        raise ValueError(f"expected {nbytes} bytes per element, got {data.shape[1]}")
    data = data.copy()
    flags_mask = (0xFF << (8 - flag_bits)) & 0xFF if flag_bits else 0
    flags = (data[:, -1] & flags_mask).astype(np.uint8)
    data[:, -1] &= 0xFF ^ flags_mask
    limbs_np = _bytes_to_limbs(spec, data)
    valid = np.ones(data.shape[0], dtype=bool)
    if validate:
        # canonical value must be < p
        p_limbs = np.asarray(spec.modulus_limbs, dtype=np.uint32)
        lt = np.zeros(data.shape[0], dtype=bool)
        decided = np.zeros(data.shape[0], dtype=bool)
        for i in range(spec.num_limbs - 1, -1, -1):
            li = limbs_np[i]
            lt |= (~decided) & (li < p_limbs[i])
            decided |= li != p_limbs[i]
        valid = lt
    arr = jnp.asarray(limbs_np)
    if mont:
        arr = fp.to_mont(spec, arr)
    return arr, flags, valid
