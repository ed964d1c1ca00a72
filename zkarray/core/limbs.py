"""Planar base-2^16 limb primitives on uint32 arrays.

Reference analog: ark-ff's ``BigInt<N>`` fixed-size integer and its u64
carry-chain primitives adc/sbb/mac (ff/src/biginteger/mod.rs:34,
ff/src/biginteger/arithmetic.rs:5-130). On TPU there is no u64×u64→u128, so
limbs are 16-bit values held in uint32 lanes: a 16×16 product fits exactly in
uint32, and lazy column accumulators keep ≥9 bits of headroom before a carry
sweep is needed (the "wasm 32-bit split" pattern the reference uses at
ff/src/biginteger/arithmetic.rs:126+, vectorized).

Layout: ``uint32[L, *batch]`` — limb axis LEADING so that batch axes map to
TPU lanes/sublanes contiguously and per-limb Python indexing yields whole
batch planes.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
DTYPE = jnp.uint32


# ---------------------------------------------------------------------------
# host <-> limb conversion (numpy; boundary code, not a hot path)
# ---------------------------------------------------------------------------

def int_to_limbs_np(x: int, num_limbs: int) -> np.ndarray:
    """One Python int -> (L,) uint32 little-endian base-2^16 limbs."""
    if x < 0:
        raise ValueError("negative")
    out = np.empty(num_limbs, dtype=np.uint32)
    for i in range(num_limbs):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    if x:
        raise ValueError("integer does not fit in given limb count")
    return out


def ints_to_limbs_np(xs: Sequence[int], num_limbs: int) -> np.ndarray:
    """Python ints -> (L, len(xs)) uint32 planar limb array."""
    out = np.empty((num_limbs, len(xs)), dtype=np.uint32)
    for j, x in enumerate(xs):
        out[:, j] = int_to_limbs_np(x, num_limbs)
    return out


def limbs_to_int(limbs) -> int:
    """(L,) limb vector (numpy/jax) -> Python int."""
    limbs = np.asarray(limbs, dtype=np.uint64)
    x = 0
    for i in range(limbs.shape[0] - 1, -1, -1):
        x = (x << LIMB_BITS) | int(limbs[i])
    return x


def limbs_to_ints(limbs) -> list:
    """(L, *batch) planar limb array -> flat list of Python ints."""
    arr = np.asarray(limbs)
    L = arr.shape[0]
    flat = arr.reshape(L, -1)
    return [limbs_to_int(flat[:, j]) for j in range(flat.shape[1])]


# ---------------------------------------------------------------------------
# device primitives (jnp; everything is batch-broadcast over trailing axes)
# ---------------------------------------------------------------------------

def zeros(num_limbs: int, batch_shape: Tuple[int, ...] = ()) -> jnp.ndarray:
    return jnp.zeros((num_limbs,) + tuple(batch_shape), dtype=DTYPE)


def broadcast_const(limbs: Sequence[int], batch_shape: Tuple[int, ...]) -> jnp.ndarray:
    """Constant limb tuple -> (L, *batch) array (XLA folds it)."""
    c = jnp.asarray(np.asarray(limbs, dtype=np.uint32))
    return jnp.broadcast_to(
        c.reshape((len(limbs),) + (1,) * len(batch_shape)),
        (len(limbs),) + tuple(batch_shape),
    )


def normalize(cols: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    """Carry-propagate lazy base-2^16 columns into canonical 16-bit limbs.

    ``cols``: (K, *batch) uint32, each column < 2^32 / 2 (lazy accumulators).
    Returns (out_limbs, *batch) canonical limbs; overflow beyond out_limbs is
    dropped (callers guarantee it is zero).
    """
    k_in = cols.shape[0]
    if k_in < out_limbs:
        cols = jnp.concatenate(
            [cols, jnp.zeros((out_limbs - k_in,) + cols.shape[1:], dtype=cols.dtype)]
        )
    elif k_in > out_limbs:
        cols = cols[:out_limbs]

    # The carry ripple is inherently serial over limbs; emitting it as a
    # lax.scan keeps the graph at O(1) ops instead of O(L) — graph size (and
    # with it XLA compile time of everything built on field muls) is this
    # module's scarce resource, not runtime (the batch axes carry the width).
    def body(carry, col):
        t = col + carry
        return t >> LIMB_BITS, t & LIMB_MASK

    _, outs = jax.lax.scan(body, jnp.zeros_like(cols[0]), cols)
    return outs


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Canonical limb add (same length), result has one extra limb."""
    s = a + b  # lazy, each column < 2^17
    return normalize(s, a.shape[0] + 1)


def sub_with_borrow(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """a - b over canonical limbs. Returns (diff limbs, borrow mask uint32).

    borrow == 1 where b > a (per batch element).
    """
    def body(borrow, ab):
        ak, bk = ab
        t = ak - bk - borrow  # uint32 wraparound
        return t >> 31, t & LIMB_MASK  # borrow: 1 iff wrapped negative

    borrow, outs = jax.lax.scan(body, jnp.zeros_like(a[0]), (a, b))
    return outs, borrow


def geq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b elementwise over the batch; bool array."""
    _, borrow = sub_with_borrow(a, b)
    return borrow == 0


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-batch-element select: mask True -> a. mask shape = batch shape."""
    return jnp.where(mask[None], a, b)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    """True where all limbs are zero (batch-shaped bool)."""
    return jnp.all(a == 0, axis=0)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=0)


def bit(a: jnp.ndarray, i: int) -> jnp.ndarray:
    """Bit i (Python int index) of each batch element, as uint32 0/1."""
    return (a[i // LIMB_BITS] >> (i % LIMB_BITS)) & 1


def num_bits_total(a: jnp.ndarray) -> jnp.ndarray:
    """Bit length per batch element (int32)."""
    L = a.shape[0]
    x = a.astype(jnp.int32)
    # per-limb bit length: 16 - clz16
    def limb_bits(v):
        r = jnp.zeros_like(v)
        for s in (8, 4, 2, 1):
            m = v >= (1 << s)
            r = r + jnp.where(m, s, 0)
            v = jnp.where(m, v >> s, v)
        return r + (v > 0)
    nz_any = jnp.zeros(a.shape[1:], dtype=jnp.int32)
    out = jnp.zeros(a.shape[1:], dtype=jnp.int32)
    for i in range(L - 1, -1, -1):
        fresh = (nz_any == 0) & (x[i] > 0)
        out = jnp.where(fresh, i * LIMB_BITS + limb_bits(x[i]), out)
        nz_any = nz_any | (x[i] > 0).astype(jnp.int32)
    return out
