"""Generic u64 small fields: Montgomery arithmetic for ANY odd 33–64-bit
prime, in paired u32 lanes.

Reference analog: ark-ff's generic u64 SmallFp Montgomery backend
(ff-macros/src/small_fp/montgomery_backend.rs:410-520,
ff/src/fields/models/small_fp/small_fp_backend.rs:20-120) — the reference
emits per-prime specialized u64 Montgomery code with fast paths for
shift-structured primes; the TPU build keeps Goldilocks' ε-fold fast path in
zkarray/ff/fp64.py and this module is the GENERIC backend for every other
33–64-bit prime (the "any prime has a home" guarantee).

Design: TPU lanes are 32-bit, so a u64 element is a ``uint32[2, *batch]``
planar pair (row 0 = lo, row 1 = hi) in Montgomery form with R = 2^64.
Multiplication is a 2-limb base-2^32 CIOS: 4 × (32×32→64) partial products
(each built from 16-bit splits — no u64 anywhere) followed by two
interleaved Montgomery steps with inv32 = -p^{-1} mod 2^32, all straight-line
vector ops with explicit carry tracking.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.ff.fp64 import _addc, _mul32, _subb

MASK16 = np.uint32(0xFFFF)


class SmallFp64Spec:
    """Config for a generic u64 prime field (Montgomery form, R = 2^64).

    Host-precomputed constants (the trace-time analog of the reference's
    per-prime macro expansion): R, R², inv32, two-adic structure.
    """

    def __init__(self, modulus: int, generator: int, name: str = ""):
        assert (1 << 32) < modulus < (1 << 64) and modulus % 2 == 1
        self.modulus = modulus
        self.generator_int = generator
        self.name = name or f"smallfp64_{modulus:#x}"
        self.r_int = (1 << 64) % modulus
        self.r2_int = pow(self.r_int, 2, modulus)
        self.inv32 = (-pow(modulus, -1, 1 << 32)) % (1 << 32)
        t = modulus - 1
        s = 0
        while t % 2 == 0:
            t //= 2
            s += 1
        self.two_adicity, self.trace = s, t
        self.two_adic_root_int = pow(generator, t, modulus)

    def __hash__(self):
        return hash(("smallfp64", self.modulus, self.generator_int))

    def __eq__(self, o):
        return isinstance(o, SmallFp64Spec) and o.modulus == self.modulus

    def root_of_unity(self, n: int) -> int:
        k = (n & -n).bit_length() - 1
        assert n == 1 << k and k <= self.two_adicity
        w = self.two_adic_root_int
        for _ in range(self.two_adicity - k):
            w = w * w % self.modulus
        return w

    def to_mont_int(self, x: int) -> int:
        return (x << 64) % self.modulus

    def from_mont_int(self, x: int) -> int:
        return (x * pow(1 << 64, -1, self.modulus)) % self.modulus


def _split(x: int) -> Tuple[np.uint32, np.uint32]:
    return np.uint32(x & 0xFFFFFFFF), np.uint32((x >> 32) & 0xFFFFFFFF)


def _geq(a_lo, a_hi, b_lo, b_hi):
    return (a_hi > b_hi) | ((a_hi == b_hi) & (a_lo >= b_lo))


def _cond_sub_p(spec, lo, hi):
    p_lo, p_hi = _split(spec.modulus)
    d_lo, d_hi, _ = _subb(lo, hi, jnp.full_like(lo, p_lo), jnp.full_like(hi, p_hi))
    take = _geq(lo, hi, p_lo, p_hi)
    return jnp.where(take, d_lo, lo), jnp.where(take, d_hi, hi)


def mont_mul(spec: SmallFp64Spec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a·b·R^{-1} mod p over (2, *batch) u32 pairs (2-limb base-2^32 CIOS).

    Reference: the u64 Montgomery multiply the SmallFp codegen emits
    (ff-macros/src/small_fp/montgomery_backend.rs:410-520), re-laid for
    32-bit lanes with explicit carries.
    """
    a0, a1 = a[0], a[1]
    b0, b1 = b[0], b[1]
    inv32 = np.uint32(spec.inv32)
    p_lo, p_hi = _split(spec.modulus)
    p_lo_b = None  # filled lazily with full_like below

    # ---- schoolbook product: (a1·2^32 + a0)(b1·2^32 + b0) = w3..w0 ----
    ll_lo, ll_hi = _mul32(a0, b0)
    lh_lo, lh_hi = _mul32(a0, b1)
    hl_lo, hl_hi = _mul32(a1, b0)
    hh_lo, hh_hi = _mul32(a1, b1)
    w0 = ll_lo
    # w1 = ll_hi + lh_lo + hl_lo (with carries into w2)
    s1 = ll_hi + lh_lo
    c1 = (s1 < ll_hi).astype(jnp.uint32)
    w1 = s1 + hl_lo
    c1 = c1 + (w1 < s1).astype(jnp.uint32)
    # w2 = lh_hi + hl_hi + hh_lo + c1 (carries into w3)
    s2 = lh_hi + hl_hi
    c2 = (s2 < lh_hi).astype(jnp.uint32)
    w2 = s2 + hh_lo
    c2 = c2 + (w2 < s2).astype(jnp.uint32)
    w2c = w2 + c1
    c2 = c2 + (w2c < w2).astype(jnp.uint32)
    w2 = w2c
    w3 = hh_hi + c2  # cannot overflow: product < 2^128

    # ---- two interleaved Montgomery steps (base 2^32) ----
    def mont_step(w0, w1, w2, w3):
        m = w0 * inv32  # mod 2^32
        mp_lo, mp_hi = _mul32(m, jnp.broadcast_to(jnp.uint32(p_lo), m.shape))
        mp2_lo, mp2_hi = _mul32(m, jnp.broadcast_to(jnp.uint32(p_hi), m.shape))
        # m·p = (mp2_hi·2^64 + (mp2_lo + mp_hi)·2^32 + mp_lo)
        mid = mp_hi + mp2_lo
        cm = (mid < mp_hi).astype(jnp.uint32)
        hi2 = mp2_hi + cm  # < 2^32 (m·p < 2^96)
        # t = w + m·p; t0 == 0 by construction; result >>= 32
        t0 = w0 + mp_lo
        c0 = (t0 < w0).astype(jnp.uint32)
        t1 = w1 + mid
        ca = (t1 < w1).astype(jnp.uint32)
        t1c = t1 + c0
        ca = ca + (t1c < t1).astype(jnp.uint32)
        t2 = w2 + hi2
        cb = (t2 < w2).astype(jnp.uint32)
        t2c = t2 + ca
        cb = cb + (t2c < t2).astype(jnp.uint32)
        t3 = w3 + cb  # bounded: total < 2^128 + 2^96·... stays in 4 words
        return t1c, t2c, t3

    u1, u2, u3 = mont_step(w0, w1, w2, w3)
    v1, v2, v3 = mont_step(u1, u2, u3, jnp.zeros_like(u3))
    # after two steps the value is (a·b + (..)p)/2^64 < 2p in (v1, v2)
    # with v3 the potential extra bit
    lo, hi = v1, v2
    # v3 ∈ {0, 1}: fold 2^64 ≡ R ≡ r_int (mod p): add r where v3 set
    r_lo, r_hi = _split(spec.r_int)
    f_lo, f_hi, _ = _addc(lo, hi, jnp.full_like(lo, r_lo), jnp.full_like(hi, r_hi))
    lo = jnp.where(v3 != 0, f_lo, lo)
    hi = jnp.where(v3 != 0, f_hi, hi)
    lo, hi = _cond_sub_p(spec, lo, hi)
    lo, hi = _cond_sub_p(spec, lo, hi)
    return jnp.stack([lo, hi])


def add(spec: SmallFp64Spec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    lo, hi, c = _addc(a[0], a[1], b[0], b[1])
    # a + b < 2p <= 2^65: a carry means subtract p once via 2^64 ≡ r? For
    # p > 2^63 a+b can exceed 2^64. Fold carry as +r_int (2^64 mod p).
    r_lo, r_hi = _split(spec.r_int)
    f_lo, f_hi, _ = _addc(lo, hi, jnp.full_like(lo, r_lo), jnp.full_like(hi, r_hi))
    lo = jnp.where(c != 0, f_lo, lo)
    hi = jnp.where(c != 0, f_hi, hi)
    lo, hi = _cond_sub_p(spec, lo, hi)
    return jnp.stack([lo, hi])


def sub(spec: SmallFp64Spec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    lo, hi, br = _subb(a[0], a[1], b[0], b[1])
    p_lo, p_hi = _split(spec.modulus)
    f_lo, f_hi, _ = _addc(lo, hi, jnp.full_like(lo, p_lo), jnp.full_like(hi, p_hi))
    return jnp.stack(
        [jnp.where(br != 0, f_lo, lo), jnp.where(br != 0, f_hi, hi)]
    )


def neg(spec: SmallFp64Spec, a: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros_like(a)
    out = sub(spec, z, a)
    isz = (a[0] == 0) & (a[1] == 0)
    return jnp.where(isz[None], a, out)


def one(spec: SmallFp64Spec, batch_shape=()) -> jnp.ndarray:
    r_lo, r_hi = _split(spec.r_int)
    return jnp.stack(
        [
            jnp.full(batch_shape, r_lo, dtype=jnp.uint32),
            jnp.full(batch_shape, r_hi, dtype=jnp.uint32),
        ]
    )


def pow_const(spec: SmallFp64Spec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    if e == 0:
        return one(spec, a.shape[1:])
    bits = jnp.asarray([(e >> i) & 1 for i in range(max(1, e.bit_length()))],
                       dtype=jnp.uint32)

    def body(carry, bit):
        res, base = carry
        res2 = mont_mul(spec, res, base)
        res = jnp.where(bit == 1, res2, res)
        return (res, mont_mul(spec, base, base)), None

    (res, _), _ = jax.lax.scan(body, (one(spec, a.shape[1:]), a), bits)
    return res


def inv(spec: SmallFp64Spec, a: jnp.ndarray) -> jnp.ndarray:
    """a^{-1} via Fermat; inv(0) = 0 (reference returns None for 0)."""
    return pow_const(spec, a, spec.modulus - 2)


def from_ints(spec: SmallFp64Spec, xs) -> jnp.ndarray:
    vals = [spec.to_mont_int(int(x) % spec.modulus) for x in xs]
    lo = np.asarray([v & 0xFFFFFFFF for v in vals], dtype=np.uint32)
    hi = np.asarray([v >> 32 for v in vals], dtype=np.uint32)
    return jnp.stack([jnp.asarray(lo), jnp.asarray(hi)])


def to_ints(spec: SmallFp64Spec, a) -> list:
    arr = np.asarray(a).astype(np.uint64)
    flat = (arr[0].astype(np.uint64) | (arr[1].astype(np.uint64) << np.uint64(32))).reshape(-1)
    return [spec.from_mont_int(int(v)) for v in flat]


# jit entry points (spec static)
mont_mul = jax.jit(mont_mul, static_argnums=0)
add = jax.jit(add, static_argnums=0)
sub = jax.jit(sub, static_argnums=0)
neg = jax.jit(neg, static_argnums=0)
pow_const = jax.jit(pow_const, static_argnums=(0, 2))
inv = jax.jit(inv, static_argnums=0)
