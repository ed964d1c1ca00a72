"""Fp64: u64 small fields in paired u32 lanes — Goldilocks fast path.

Reference analog: ark-ff's u64 SmallFp backend (ff-macros/src/small_fp/
montgomery_backend.rs:410-520, test-curves/src/smallfp.rs). The reference
reduces with 64-bit Montgomery/Pornin sequences; TPUs have no u64 lanes, so
an element is a (lo, hi) pair of uint32 planes and the Goldilocks prime
p = 2^64 - 2^32 + 1 uses its shift-structured reduction
(2^64 ≡ 2^32 - 1, 2^96 ≡ -1 mod p): a 128-bit product folds with adds,
shifts and one multiply by ε = 2^32 - 1. No Montgomery form — values are
canonical u64 residues.

Arrays are uint32[2, *batch] (row 0 = lo, row 1 = hi).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MASK16 = np.uint32(0xFFFF)
EPS = np.uint32(0xFFFFFFFF)  # 2^32 - 1 as u32 (== ε mod 2^32)


class Fp64Spec:
    def __init__(self, modulus: int, generator: int, name: str = ""):
        assert 1 << 32 < modulus < 1 << 64
        self.modulus = modulus
        self.generator_int = generator
        self.name = name or f"fp64_{modulus:#x}"
        t = modulus - 1
        s = 0
        while t % 2 == 0:
            t //= 2
            s += 1
        self.two_adicity, self.trace = s, t
        self.two_adic_root_int = pow(generator, t, modulus)

    def __hash__(self):
        return hash(("fp64", self.modulus, self.generator_int))

    def __eq__(self, o):
        return isinstance(o, Fp64Spec) and o.modulus == self.modulus

    def root_of_unity(self, n: int) -> int:
        k = (n & -n).bit_length() - 1
        assert n == 1 << k and k <= self.two_adicity
        w = self.two_adic_root_int
        for _ in range(self.two_adicity - k):
            w = w * w % self.modulus
        return w


GOLDILOCKS = Fp64Spec((1 << 64) - (1 << 32) + 1, generator=7, name="goldilocks")


# ---------------------------------------------------------------------------
# u32-pair primitive ops (vectorized u64 arithmetic)
# ---------------------------------------------------------------------------

def _mul32(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """u32×u32 -> (lo32, hi32) via 16-bit partial products."""
    a0, a1 = a & MASK16, a >> 16
    b0, b1 = b & MASK16, b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = (ll >> 16) + (lh & MASK16) + (hl & MASK16)
    lo = (ll & MASK16) | ((mid & MASK16) << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    return lo, hi


def _addc(a_lo, a_hi, b_lo, b_hi):
    """(a + b) as (lo, hi, carry) — exact carry computation."""
    lo = a_lo + b_lo
    c0 = (lo < a_lo).astype(jnp.uint32)
    h1 = a_hi + b_hi
    c1 = (h1 < a_hi).astype(jnp.uint32)
    hi = h1 + c0
    c2 = (hi < h1).astype(jnp.uint32)
    return lo, hi, c1 | c2


def _subb(a_lo, a_hi, b_lo, b_hi):
    """(a - b) as (lo, hi, borrow)."""
    lo = a_lo - b_lo
    br0 = (a_lo < b_lo).astype(jnp.uint32)
    h1 = a_hi - b_hi
    br1 = (a_hi < b_hi).astype(jnp.uint32)
    hi = h1 - br0
    br2 = (h1 < br0).astype(jnp.uint32)
    return lo, hi, br1 | br2


_P_LO = np.uint32(1)
_P_HI = EPS  # p = 0xFFFFFFFF_00000001


def _geq_p(lo, hi):
    return (hi > _P_HI) | ((hi == _P_HI) & (lo >= _P_LO))


def _cond_sub_p(lo, hi, cond=None):
    d_lo, d_hi, _ = _subb(lo, hi, jnp.full_like(lo, _P_LO), jnp.full_like(hi, _P_HI))
    take = _geq_p(lo, hi) if cond is None else cond
    return jnp.where(take, d_lo, lo), jnp.where(take, d_hi, hi)


def _reduce128(w0, w1, w2, w3):
    """(w3·2^96 + w2·2^64 + w1·2^32 + w0) mod p for Goldilocks.

    2^96 ≡ -1, 2^64 ≡ ε = 2^32 - 1 (mod p):
    n ≡ (w0 + w1·2^32) - w3 + w2·ε. Matches the standard 3-step
    reduce128 sequence (e.g. reference test-curves Goldilocks path).
    """
    # t = lo64 - w3 (borrow → subtract ε once more, i.e. add p ≡ -ε ... )
    t_lo, t_hi, br = _subb(w0, w1, w3, jnp.zeros_like(w3))
    # on borrow: t -= ε  (mod 2^64 arithmetic keeps the value ≡ mod p)
    e_lo = jnp.where(br == 1, EPS, jnp.uint32(0))
    t_lo2, t_hi2, _ = _subb(t_lo, t_hi, e_lo, jnp.zeros_like(t_lo))
    # + w2·ε = w2·2^32 - w2
    m_lo, m_hi = _mul32(w2, EPS)
    r_lo, r_hi, c = _addc(t_lo2, t_hi2, m_lo, m_hi)
    # carry → add ε
    e2 = jnp.where(c == 1, EPS, jnp.uint32(0))
    r_lo2, r_hi2, c2 = _addc(r_lo, r_hi, e2, jnp.zeros_like(r_lo))
    r_lo2, r_hi2 = _cond_sub_p(r_lo2, r_hi2)
    return jnp.stack([r_lo2, r_hi2])


# ---------------------------------------------------------------------------
# field ops — arrays uint32[2, *batch]
# ---------------------------------------------------------------------------

@jax.jit
def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a·b) mod p, full 128-bit product + Goldilocks fold."""
    a0, a1 = a[0], a[1]
    b0, b1 = b[0], b[1]
    ll_lo, ll_hi = _mul32(a0, b0)  # w0 + w1·2^32 contribution
    lh_lo, lh_hi = _mul32(a0, b1)
    hl_lo, hl_hi = _mul32(a1, b0)
    hh_lo, hh_hi = _mul32(a1, b1)
    # accumulate 128-bit words w0..w3
    w0 = ll_lo
    # w1 = ll_hi + lh_lo + hl_lo (with carries into w2)
    s1 = ll_hi + lh_lo
    c1 = (s1 < ll_hi).astype(jnp.uint32)
    w1 = s1 + hl_lo
    c2 = (w1 < s1).astype(jnp.uint32)
    # w2 = lh_hi + hl_hi + hh_lo + carries
    s2 = lh_hi + hl_hi
    d1 = (s2 < lh_hi).astype(jnp.uint32)
    s3 = s2 + hh_lo
    d2 = (s3 < s2).astype(jnp.uint32)
    w2 = s3 + c1 + c2
    d3 = (w2 < s3).astype(jnp.uint32)
    w3 = hh_hi + d1 + d2 + d3
    return _reduce128(w0, w1, w2, w3)


@jax.jit
def sqr(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


@jax.jit
def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    lo, hi, c = _addc(a[0], a[1], b[0], b[1])
    # overflow past 2^64: value ≡ +ε (since 2^64 ≡ ε)
    e = jnp.where(c == 1, EPS, jnp.uint32(0))
    lo, hi, c2 = _addc(lo, hi, e, jnp.zeros_like(lo))
    lo, hi = _cond_sub_p(lo, hi, _geq_p(lo, hi) | (c2 == 1))
    return jnp.stack([lo, hi])


@jax.jit
def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    lo, hi, br = _subb(a[0], a[1], b[0], b[1])
    # borrow: add p (≡ subtract ε mod 2^64 keeps congruence; add p exactly)
    p_lo = jnp.where(br == 1, _P_LO, jnp.uint32(0))
    p_hi = jnp.where(br == 1, _P_HI, jnp.uint32(0))
    lo, hi, _ = _addc(lo, hi, p_lo, p_hi)
    return jnp.stack([lo, hi])


@jax.jit
def neg(a: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros_like(a)
    out = sub(z, a)
    isz = (a[0] == 0) & (a[1] == 0)
    return jnp.where(isz[None], a, out)


def pow_const(a: jnp.ndarray, e: int) -> jnp.ndarray:
    if e == 0:
        return one_like(a)
    bits = jnp.asarray(np.asarray([int(b) for b in bin(e)[2:]], dtype=np.uint32))

    def body(r, bit):
        r = sqr(r)
        rm = mul(r, a)
        return jnp.where(bit == 1, rm, r), None

    r, _ = jax.lax.scan(body, one_like(a), bits)
    return r


def inv(spec: Fp64Spec, a: jnp.ndarray) -> jnp.ndarray:
    """a^(p-2); inv(0) = 0."""
    return pow_const(a, spec.modulus - 2)


def one_like(a: jnp.ndarray) -> jnp.ndarray:
    lo = jnp.ones_like(a[0])
    hi = jnp.zeros_like(a[1])
    return jnp.stack([lo, hi])


def from_ints(xs) -> jnp.ndarray:
    xs = [int(x) % GOLDILOCKS.modulus for x in xs]
    lo = np.asarray([x & 0xFFFFFFFF for x in xs], dtype=np.uint32)
    hi = np.asarray([x >> 32 for x in xs], dtype=np.uint32)
    return jnp.stack([jnp.asarray(lo), jnp.asarray(hi)])


def to_ints(a) -> list:
    arr = np.asarray(a)
    lo = arr[0].ravel().astype(np.uint64)
    hi = arr[1].ravel().astype(np.uint64)
    return [int(l) | (int(h) << 32) for l, h in zip(lo, hi)]


# ---------------------------------------------------------------------------
# radix-2 NTT over Goldilocks pairs (two-adicity 32)
# ---------------------------------------------------------------------------

def _bitrev(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@functools.partial(jax.jit, static_argnums=(1, 2))
def ntt(x: jnp.ndarray, w_int: int, inverse: bool = False) -> jnp.ndarray:
    """In-order radix-2 NTT over axis 1 of uint32[2, n]; fuses n^{-1} on
    inverse. Mirrors smallfp.ntt for the pair representation."""
    spec = GOLDILOCKS
    p = spec.modulus
    n = x.shape[1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    w = pow(w_int, -1, p) if inverse else w_int
    # twiddle table on host (u64 ints): n/2 entries
    tw = [1] * max(n // 2, 1)
    for i in range(1, n // 2):
        tw[i] = tw[i - 1] * w % p
    tw_arr = from_ints(tw)
    x = jnp.take(x, jnp.asarray(_bitrev(log_n)), axis=1)
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        xs = x.reshape(2, n // m, m)
        lo = xs[:, :, :half]
        hi = xs[:, :, half:]
        w_stage = tw_arr[:, :: n // m].reshape(2, 1, half)
        t = mul(hi, jnp.broadcast_to(w_stage, hi.shape))
        x = jnp.concatenate([add(lo, t), sub(lo, t)], axis=2).reshape(2, n)
    if inverse:
        ninv = pow(n, -1, p)
        x = mul(x, jnp.broadcast_to(from_ints([ninv]).reshape(2, 1), x.shape))
    return x
