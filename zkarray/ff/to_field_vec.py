"""ToConstraintField analog: flatten values to base-field element vectors
(R1CS public-input packing).

Reference: ff/src/to_field_vec.rs:7-68 — field elements map to their
base-prime-field decomposition; bytes pack into field elements of
(bits-1)//8 bytes each; curve points map to (x, y) coordinates.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from zkarray.core.fieldspec import FieldSpec
from zkarray.ff import fp


def field_to_field_vec(spec: FieldSpec, a: jnp.ndarray) -> List[jnp.ndarray]:
    """Prime-field elements: identity decomposition [a]."""
    return [a]


def bytes_to_field_vec(spec: FieldSpec, data: bytes) -> jnp.ndarray:
    """Pack bytes into field elements, (MODULUS_BITS - 1)//8 bytes per
    element (reference to_field_vec.rs impl for [u8])."""
    per = (spec.bits - 1) // 8
    chunks = [data[i : i + per] for i in range(0, len(data), per)]
    vals = [int.from_bytes(c, "little") for c in chunks]
    return fp.from_ints(spec, vals)


def affine_to_field_vec(curve, pts) -> List[jnp.ndarray]:
    """SW affine points -> [x, y] coordinate vectors (reference ec impl)."""
    return [pts.x, pts.y]
