"""SmallFp: single-lane fields for p < 2^32 — native uint32 TPU citizens.

Reference analog: ark-ff's SmallFp backend (ff/src/fields/models/small_fp/
small_fp_backend.rs:20-120) and its per-prime codegen fast paths
(ff-macros/src/small_fp/montgomery_backend.rs): Montgomery with R = 2^32,
plus Mersenne (M31) shift-based reduction. One field element = one uint32
lane — on TPU these run at full VPU width with ~6 int ops per mul, the
best-case arithmetic density of the whole framework.

Arrays are plain uint32 (*batch,) — no limb axis.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SmallFieldSpec:
    def __init__(self, modulus: int, generator: int, name: str = ""):
        assert 2 < modulus < 1 << 32 and modulus % 2 == 1
        self.modulus = modulus
        self.generator_int = generator
        self.name = name or f"smallfp_{modulus:#x}"
        self.r_int = (1 << 32) % modulus
        self.r2_int = self.r_int * self.r_int % modulus
        self.inv32 = (-pow(modulus, -1, 1 << 32)) % (1 << 32)
        t = modulus - 1
        s = 0
        while t % 2 == 0:
            t //= 2
            s += 1
        self.two_adicity, self.trace = s, t
        self.two_adic_root_int = pow(generator, t, modulus)
        self.is_mersenne = (modulus & (modulus + 1)) == 0  # p = 2^k - 1

    def __hash__(self):
        return hash(("small", self.modulus, self.generator_int))

    def __eq__(self, o):
        return isinstance(o, SmallFieldSpec) and o.modulus == self.modulus

    def to_mont_int(self, x):
        return x * self.r_int % self.modulus

    def from_mont_int(self, x):
        return x * pow(self.r_int, -1, self.modulus) % self.modulus

    def root_of_unity(self, n: int) -> int:
        k = (n & -n).bit_length() - 1
        assert n == 1 << k and k <= self.two_adicity
        w = self.two_adic_root_int
        for _ in range(self.two_adicity - k):
            w = w * w % self.modulus
        return w


def _mul_wide(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full 32×32 → (hi, lo) via 16-bit split (no u64 on TPU)."""
    al, ah = a & 0xFFFF, a >> 16
    bl, bh = b & 0xFFFF, b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl  # < 2^33 → track its carry
    mid_carry = (mid < lh).astype(jnp.uint32)  # wraparound detect
    lo = ll + (mid << 16)
    lo_carry = (lo < ll).astype(jnp.uint32)
    hi = hh + (mid >> 16) + (mid_carry << 16) + lo_carry
    return hi, lo


@functools.partial(jax.jit, static_argnums=0)
def mont_mul(spec: SmallFieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery multiply, R = 2^32 (reference small_fp_backend mul)."""
    p = np.uint32(spec.modulus)
    hi, lo = _mul_wide(a, b)
    m = lo * np.uint32(spec.inv32)
    mp_hi, mp_lo = _mul_wide(m, jnp.full_like(a, p))
    # t = (T + m*p) >> 32 = hi + mp_hi + carry(lo + mp_lo)
    carry = ((lo + mp_lo) < lo).astype(jnp.uint32)
    t = hi + mp_hi + carry
    return jnp.where(t >= p, t - p, t)


@functools.partial(jax.jit, static_argnums=0)
def add(spec: SmallFieldSpec, a, b):
    p = np.uint32(spec.modulus)
    s = a + b  # < 2^33 can wrap; p < 2^32 so use wrap detect
    wrapped = s < a
    ge = wrapped | (s >= p)
    return jnp.where(ge, s - p, s)


@functools.partial(jax.jit, static_argnums=0)
def sub(spec: SmallFieldSpec, a, b):
    p = np.uint32(spec.modulus)
    d = a - b
    return jnp.where(a < b, d + p, d)


@functools.partial(jax.jit, static_argnums=0)
def neg(spec: SmallFieldSpec, a):
    p = np.uint32(spec.modulus)
    return jnp.where(a == 0, a, p - a)


def mont_sqr(spec, a):
    return mont_mul(spec, a, a)


@functools.partial(jax.jit, static_argnums=(0, 2))
def pow_const(spec: SmallFieldSpec, a, e: int):
    if e == 0:
        return jnp.full_like(a, np.uint32(spec.r_int))
    bits = jnp.asarray(np.asarray([int(x) for x in bin(e)[2:]], dtype=np.uint32))

    # left-to-right square & multiply via scan
    def body2(r, bit):
        r = mont_mul(spec, r, r)
        rm = mont_mul(spec, r, a)
        return jnp.where(bit == 1, rm, r), None

    one = jnp.full_like(a, np.uint32(spec.r_int))
    r, _ = jax.lax.scan(body2, one, bits)
    return r


def inv(spec: SmallFieldSpec, a):
    return pow_const(spec, a, spec.modulus - 2)


def from_ints(spec: SmallFieldSpec, xs, mont=True):
    vals = [spec.to_mont_int(int(x) % spec.modulus) if mont else int(x) % spec.modulus for x in xs]
    return jnp.asarray(np.asarray(vals, dtype=np.uint32))


def to_ints(spec: SmallFieldSpec, a, mont=True):
    vals = [int(v) for v in np.asarray(a).reshape(-1)]
    return [spec.from_mont_int(v) if mont else v for v in vals]


# ---------------------------------------------------------------------------
# M31 Mersenne fast path (reference: ff-macros Mersenne specialization)
# ---------------------------------------------------------------------------

M31 = SmallFieldSpec((1 << 31) - 1, generator=7, name="m31")
BABYBEAR = SmallFieldSpec((15 << 27) + 1, generator=31, name="babybear")
KOALABEAR = SmallFieldSpec((1 << 31) - (1 << 24) + 1, generator=3, name="koalabear")


@jax.jit
def m31_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Canonical-form M31 product: (hi·2^32 + lo) mod 2^31-1 via shifts
    (no Montgomery needed — reference M31 fast path)."""
    p = np.uint32((1 << 31) - 1)
    hi, lo = _mul_wide(a, b)
    # x = hi·2^32 + lo ≡ hi·2 + lo (mod 2^31−1) with folding
    t = (lo & p) + (lo >> 31) + ((hi << 1) & p) + (hi >> 30)
    t = (t & p) + (t >> 31)
    t = (t & p) + (t >> 31)
    return jnp.where(t == p, jnp.zeros_like(t), t)


# ---------------------------------------------------------------------------
# radix-2 NTT over a small field (BabyBear / KoalaBear / Goldilocks-32 etc.)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def ntt(spec: SmallFieldSpec, x: jnp.ndarray, w_int: int, inverse: bool = False):
    """In-order radix-2 NTT over (n,) or (n, batch) uint32 Montgomery values."""
    n = x.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    p = spec.modulus
    if inverse:
        w_int = pow(w_int, -1, p)
    # twiddle table (n/2,) via host ints (small fields: cheap)
    tw_host = np.empty(max(n // 2, 1), dtype=np.uint32)
    cur = 1
    for i in range(max(n // 2, 1)):
        tw_host[i] = spec.to_mont_int(cur)
        cur = cur * w_int % p
    tw = jnp.asarray(tw_host)
    rev = np.zeros(n, dtype=np.int32)
    idx = np.arange(n)
    for bpos in range(log_n):
        rev |= ((idx >> bpos) & 1) << (log_n - 1 - bpos)
    y = jnp.take(x, jnp.asarray(rev), axis=0)
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        ys = y.reshape((n // m, m) + y.shape[1:])
        lo, hi = ys[:, :half], ys[:, half:]
        wst = tw[:: n // m][None, :half]
        wst = wst.reshape((1, half) + (1,) * (y.ndim - 1))
        t = mont_mul(spec, hi, wst)
        y = jnp.concatenate([add(spec, lo, t), sub(spec, lo, t)], axis=1)
        y = y.reshape((n,) + y.shape[2:])
    if inverse:
        n_inv = jnp.asarray(
            np.uint32(spec.to_mont_int(pow(n, -1, p))), dtype=jnp.uint32
        )
        y = mont_mul(spec, y, jnp.broadcast_to(n_inv, y.shape))
    return y
