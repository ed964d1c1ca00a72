"""BigInt utility layer: NAF/wNAF recoding, bit iteration, wide mul.

Reference analog: ark-ff's BigInteger trait surface (ff/src/biginteger/
mod.rs:34-570): find_wnaf/find_naf (arithmetic.rs:133+), BitIteratorBE/LE
(ff/src/bits.rs), mul_wide. Host helpers operate on Python ints (recoding is
boundary work); device helpers operate on planar limb arrays.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from zkarray.core import limbs as lb


def find_naf(x: int) -> List[int]:
    """Non-adjacent form digits, LSB first (reference find_naf)."""
    out = []
    while x != 0:
        if x % 2:
            z = 2 - (x % 4)
            out.append(z)
            x -= z
        else:
            out.append(0)
        x //= 2
    return out


def find_wnaf(x: int, w: int) -> List[int]:
    """Width-w NAF digits, LSB first: odd digits in (-2^(w-1), 2^(w-1))."""
    out = []
    while x != 0:
        if x % 2:
            z = x % (1 << w)
            if z >= 1 << (w - 1):
                z -= 1 << w
            out.append(z)
            x -= z
        else:
            out.append(0)
        x //= 2
    return out


def bits_be(x: int, width: int = None) -> List[int]:
    """Big-endian bit list (BitIteratorBE; optionally zero-padded)."""
    s = bin(x)[2:] if x else "0"
    if width is not None:
        s = s.zfill(width)
    return [int(c) for c in s]


def bits_le(x: int, width: int = None) -> List[int]:
    return bits_be(x, width)[::-1]


# ---- device-side wide ops on planar limb arrays ----

def mul_wide(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full product of canonical limb arrays: (La, *B) × (Lb, *B) ->
    (La+Lb, *B) canonical limbs (reference BigInt::mul_wide, schoolbook)."""
    La, Lb = a.shape[0], b.shape[0]
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    cols = lb.zeros(La + Lb + 1, batch)
    for i in range(La):
        prod = a[i][None] * b
        cols = cols.at[i : i + Lb].add(prod & lb.LIMB_MASK)
        cols = cols.at[i + 1 : i + 1 + Lb].add(prod >> lb.LIMB_BITS)
    return lb.normalize(cols, La + Lb)


def shl_limbs(a: jnp.ndarray, k_bits: int) -> jnp.ndarray:
    """Left shift by a static bit count, extending the limb axis."""
    Lw, rem = divmod(k_bits, lb.LIMB_BITS)
    L = a.shape[0]
    out_len = L + Lw + (1 if rem else 0)
    padded = jnp.pad(a, ((Lw, 1 if rem else 0),) + ((0, 0),) * (a.ndim - 1))
    if rem == 0:
        return padded[:out_len]
    lo = (padded << rem) & lb.LIMB_MASK
    hi = jnp.concatenate(
        [jnp.zeros_like(padded[:1]), (padded >> (lb.LIMB_BITS - rem))[:-1]], axis=0
    )
    return (lo | hi)[:out_len]


def shr_limbs(a: jnp.ndarray, k_bits: int) -> jnp.ndarray:
    """Right shift by a static bit count (limb count preserved)."""
    Lw, rem = divmod(k_bits, lb.LIMB_BITS)
    L = a.shape[0]
    shifted = jnp.concatenate(
        [a[Lw:], jnp.zeros((min(Lw, L),) + a.shape[1:], dtype=a.dtype)], axis=0
    )
    if rem == 0:
        return shifted
    lo = shifted >> rem
    hi = jnp.concatenate(
        [(shifted[1:] << (lb.LIMB_BITS - rem)) & lb.LIMB_MASK, jnp.zeros_like(shifted[:1])],
        axis=0,
    )
    return lo | hi
