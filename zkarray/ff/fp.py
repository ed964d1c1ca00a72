"""Batched Montgomery prime-field arithmetic on planar base-2^16 limb arrays.

Reference analog: ark-ff's Fp model + Montgomery backend
(ff/src/fields/models/fp/mod.rs:25-103, ff/src/fields/models/fp/
montgomery_backend.rs:179-378) and the Field trait ops (ff/src/fields/
mod.rs:160-355). The reference runs CIOS with u64 limbs and x86 carry chains;
on TPU every value is a batch: limbs are 16-bit values in uint32 lanes, the
CIOS recurrence runs as an unrolled chain of vector ops over the whole batch,
and carries are "lazy" column accumulators swept at the end.

All functions take ``spec: FieldSpec`` (a jit-static config) and planar limb
arrays ``uint32[L, *batch]`` in Montgomery form unless stated otherwise.
Montgomery radix R = 2^(16 L) equals arkworks' R, so Montgomery-form values
are numerically identical to the reference's.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.core import limbs as lb
from zkarray.core.fieldspec import FieldSpec, LIMB_BITS, LIMB_MASK


# ---------------------------------------------------------------------------
# constants on device
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _np_const(spec: FieldSpec, which: str) -> np.ndarray:
    """(L,) uint32 numpy constant; folded into jitted graphs."""
    p = spec.modulus
    vals = {
        "p": p,
        "one": spec.r_int,                    # 1 in Montgomery form
        "r2": spec.r2_int,
        "two_adic_root": spec.to_mont_int(spec.two_adic_root_int),
        "generator": spec.to_mont_int(spec.generator_int),
    }
    x = vals[which]
    return np.asarray(
        [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(spec.num_limbs)],
        dtype=np.uint32,
    )


def const_array(spec: FieldSpec, x_canonical: int, batch_shape=()) -> jnp.ndarray:
    """Canonical int -> Montgomery-form (L, *batch) constant array."""
    xm = spec.to_mont_int(x_canonical % spec.modulus)
    return lb.broadcast_const(
        [(xm >> (LIMB_BITS * i)) & LIMB_MASK for i in range(spec.num_limbs)],
        batch_shape,
    )


def zero(spec: FieldSpec, batch_shape=()) -> jnp.ndarray:
    return lb.zeros(spec.num_limbs, batch_shape)


def one(spec: FieldSpec, batch_shape=()) -> jnp.ndarray:
    return lb.broadcast_const(_np_const(spec, "one"), batch_shape)


def _bc(c: np.ndarray, batch_shape) -> jnp.ndarray:
    return lb.broadcast_const(c, batch_shape)


# ---------------------------------------------------------------------------
# host <-> device conversion (test/boundary helpers)
# ---------------------------------------------------------------------------

def from_ints(spec: FieldSpec, xs, mont: bool = True) -> jnp.ndarray:
    """Python ints -> (L, n) device array (Montgomery form by default)."""
    xs = [int(x) % spec.modulus for x in xs]
    if mont:
        xs = [spec.to_mont_int(x) for x in xs]
    return jnp.asarray(lb.ints_to_limbs_np(xs, spec.num_limbs))


def to_ints(spec: FieldSpec, a, mont: bool = True) -> list:
    """(L, *batch) device array -> flat list of canonical Python ints."""
    vals = lb.limbs_to_ints(np.asarray(a))
    if mont:
        vals = [spec.from_mont_int(v) for v in vals]
    return vals


# ---------------------------------------------------------------------------
# core Montgomery arithmetic
# ---------------------------------------------------------------------------

def _pad_rows(row: jnp.ndarray, lead: int, total: int) -> jnp.ndarray:
    """(R, *batch) row block -> (total, *batch) with `lead` zero rows first."""
    cfg = [(lead, total - lead - row.shape[0])] + [(0, 0)] * (row.ndim - 1)
    return jnp.pad(row, cfg)


def _cond_sub_p(spec: FieldSpec, r: jnp.ndarray) -> jnp.ndarray:
    """r (L+1 canonical limbs, value < 2p) -> r mod p as L limbs."""
    L = spec.num_limbs
    batch = r.shape[1:]
    p_ext = jnp.concatenate(
        [_bc(_np_const(spec, "p"), batch), lb.zeros(1, batch)], axis=0
    )
    diff, borrow = lb.sub_with_borrow(r, p_ext)
    return jnp.where((borrow == 0)[None], diff[:L], r[:L])


def _mont_reduce_cols(spec: FieldSpec, cols: jnp.ndarray) -> jnp.ndarray:
    """CIOS reduction over (2L+1, *batch) lazy columns.

    Emitted as a fori_loop with an O(1)-op body: graph size per reduction is
    ~20 HLO ops regardless of L. (Graph size — hence XLA compile time of
    every curve/poly graph built from field muls — is the binding resource
    here; the loop's serial trips mirror the carry recurrence, which is
    serial in any formulation. Reference: montgomery_backend.rs:234-245.)

    Each loop step: m = -t0/p mod 2^16, fold m·p into the bottom column,
    shift the column window down one limb. Column magnitudes stay < 2^31:
    inputs are lazy accumulators < 2^30 and each step adds < 2^18.
    """
    L = spec.num_limbs
    K = 2 * L + 1
    batch = cols.shape[1:]
    p_c = jnp.asarray(_np_const(spec, "p")).reshape((L,) + (1,) * len(batch))
    inv16 = np.uint32(spec.inv16)
    zero_row = jnp.zeros((1,) + batch, dtype=jnp.uint32)

    def body(_, t):
        m = (t[0] * inv16) & LIMB_MASK
        mp = m[None] * p_c  # (L, *batch)
        lo = mp & LIMB_MASK
        hi = mp >> LIMB_BITS
        # aligned fold: lo at rows 0..L-1, hi at rows 1..L
        upd = jnp.concatenate([lo[:1], lo[1:] + hi[:-1], hi[-1:]], axis=0)
        t = t.at[: L + 1].add(upd)
        carry = t[0] >> LIMB_BITS
        t = jnp.concatenate([t[1:], zero_row], axis=0)
        return t.at[0].add(carry)

    t = jax.lax.fori_loop(0, L, body, cols, unroll=False)
    r = lb.normalize(t[: L + 1], L + 1)
    return _cond_sub_p(spec, r)


def mont_reduce(spec: FieldSpec, cols: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-reduce lazy columns: returns (Σ cols·2^16i) · R^{-1} mod p.

    ``cols``: (K, *batch) lazy base-2^16 columns, K <= 2L+1, each < ~2^23.
    Exact (result < p) whenever the represented value is < R·p.
    """
    K = 2 * spec.num_limbs + 1
    if cols.shape[0] < K:
        cols = _pad_rows(cols, 0, K)
    return _mont_reduce_cols(spec, cols)


def _cios_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Interleaved CIOS Montgomery product a·b·R^{-1} mod p, as a lax.scan
    over a's limbs with an O(1)-op body (~15 HLO ops total per mul — the
    compile-time-friendly form; the Pallas kernel is the runtime-hot form).

    Per step i: fold a_i·b and m_i·p into an (L+1)-column lazy window, then
    shift down one limb. Columns stay < L·2^18 + 2^17 < 2^31.
    Reference: MontConfig::mul_assign, montgomery_backend.rs:179-246.
    """
    L = spec.num_limbs
    batch = a.shape[1:]
    p_c = jnp.asarray(_np_const(spec, "p")).reshape((L,) + (1,) * len(batch))
    inv16 = np.uint32(spec.inv16)
    zero_row = jnp.zeros((1,) + batch, dtype=jnp.uint32)

    def body(t, a_i):
        ab = a_i[None] * b  # (L, *batch), each < 2^32 - 2^17 + 1
        lo_ab = ab & LIMB_MASK
        m = ((t[0] + lo_ab[0]) * inv16) & LIMB_MASK
        mp = m[None] * p_c
        lo = lo_ab + (mp & LIMB_MASK)  # < 2^17
        hi = (ab >> LIMB_BITS) + (mp >> LIMB_BITS)
        upd = jnp.concatenate([lo[:1], lo[1:] + hi[:-1], hi[-1:]], axis=0)
        t = t + upd
        carry = t[0] >> LIMB_BITS
        t = jnp.concatenate([t[1:], zero_row], axis=0)
        return t.at[0].add(carry), None

    t0 = jnp.zeros((L + 1,) + batch, dtype=jnp.uint32)
    t, _ = jax.lax.scan(body, t0, a)
    r = lb.normalize(t, L + 1)
    return _cond_sub_p(spec, r)


def _product_cols(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook product of two L-limb arrays as (2L+1, *batch) lazy columns."""
    L = spec.num_limbs
    K = 2 * L + 1
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    cols = jnp.zeros((K,) + batch, dtype=jnp.uint32)
    for i in range(L):
        prod = a[i][None] * b  # (L, *batch)
        prod = jnp.broadcast_to(prod, (L,) + batch)
        cols = cols + _pad_rows(prod & LIMB_MASK, i, K) + _pad_rows(prod >> LIMB_BITS, i + 1, K)
    return cols


def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a·b·R^{-1} mod p (CIOS over 16-bit planar limbs).

    Reference: MontConfig::mul_assign, montgomery_backend.rs:179-246. Emitted
    as O(L) whole-row vector ops so graphs stay small (an L=24 mul is ~300
    HLO ops); on TPU the Pallas kernel path (zkarray/kernels/mont.py) is used
    for large batches instead.
    """
    from zkarray import kernels as _k

    a, b = _align2(spec.num_limbs, a, b)
    if _k.use_pallas(a.shape[1:]):
        return _k.mont_mul(spec, a, b)
    return _cios_mul(spec, a, b)


def mont_sqr(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery square (reference: montgomery_backend.rs:248-317).

    Uses the symmetric trick: off-diagonal products counted once and doubled.
    """
    from zkarray import kernels as _k

    L = spec.num_limbs
    batch = a.shape[1:]
    if _k.use_pallas(batch):
        return _k.mont_sqr(spec, a)
    # Compact-graph path: the plain CIOS scan. The symmetric doubled-
    # off-diagonal trick saves ~25% runtime but costs an O(L^2)-op graph;
    # the Pallas kernel (_sqr_body) keeps the trick for the TPU hot path.
    return _cios_mul(spec, a, a)


def _align2(L: int, a: jnp.ndarray, b: jnp.ndarray):
    """Broadcast two (L, *batch) arrays to a common batch shape, treating
    the leading limb axis as fixed and padding TRAILING batch dims (the
    numpy default would misalign the limb axis)."""
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(
        a.reshape(a.shape + (1,) * (len(batch) - (a.ndim - 1))), (L,) + batch
    )
    b = jnp.broadcast_to(
        b.reshape(b.shape + (1,) * (len(batch) - (b.ndim - 1))), (L,) + batch
    )
    return a, b


def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p."""
    a, b = _align2(spec.num_limbs, a, b)
    s = lb.normalize(a + b, spec.num_limbs + 1)
    return _cond_sub_p(spec, s)


def double(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(spec, a, a)


def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p."""
    a, b = _align2(spec.num_limbs, a, b)
    d, borrow = lb.sub_with_borrow(a, b)
    p_c = _bc(_np_const(spec, "p"), d.shape[1:])
    d_fix = lb.normalize(d + p_c, spec.num_limbs)
    return jnp.where((borrow == 0)[None], d, d_fix)


def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """-a mod p (0 stays 0)."""
    p_c = _bc(_np_const(spec, "p"), a.shape[1:])
    d, _ = lb.sub_with_borrow(p_c, a)
    return jnp.where(lb.is_zero(a)[None], a, d)


def to_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Canonical limbs -> Montgomery form (mul by R^2)."""
    return mont_mul(spec, a, _bc(_np_const(spec, "r2"), a.shape[1:]))


def from_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical limbs (reference: into_bigint,
    montgomery_backend.rs:392-412)."""
    return mont_reduce(spec, a)


def is_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return lb.is_zero(a)


def is_one(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return lb.eq(a, one(spec, a.shape[1:]))


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return lb.eq(a, b)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask (batch-shaped bool) ? a : b."""
    return jnp.where(mask[None], a, b)


# ---------------------------------------------------------------------------
# powering
# ---------------------------------------------------------------------------

def _exp_bits_le(e: int) -> np.ndarray:
    n = max(e.bit_length(), 1)
    return np.asarray([(e >> i) & 1 for i in range(n)], dtype=np.uint32)


def pow_const(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a Python-int exponent, as a lax.scan over exponent bits.

    Reference analog: Field::pow (ff/src/fields/mod.rs:258-276). Graph size is
    O(1) montmuls thanks to the scan; work is 2 muls per exponent bit.
    """
    if e == 0:
        return one(spec, a.shape[1:])
    bits = jnp.asarray(_exp_bits_le(int(e)))

    def body(carry, bit):
        res, base = carry
        res2 = mont_mul(spec, res, base)
        res = select(bit == 1, res2, res)
        base = mont_sqr(spec, base)
        return (res, base), None

    (res, _), _ = jax.lax.scan(body, (one(spec, a.shape[1:]), a), bits)
    return res


def pow_u32(spec: FieldSpec, a: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    """a^e for a traced uint32 exponent (scalar or batch-shaped), via a fixed
    32-step square-and-multiply fori_loop."""
    e = jnp.asarray(e, dtype=jnp.uint32)
    L = spec.num_limbs
    batch = jnp.broadcast_shapes(a.shape[1:], e.shape)
    a = jnp.broadcast_to(
        a.reshape(a.shape + (1,) * (len(batch) - (a.ndim - 1))), (L,) + batch
    )
    e = jnp.broadcast_to(e.reshape(e.shape + (1,) * (len(batch) - e.ndim)), batch)

    def body(i, carry):
        res, base = carry
        bit = (e >> i) & 1
        res = select(bit == 1, mont_mul(spec, res, base), res)
        return res, mont_sqr(spec, base)

    res, _ = jax.lax.fori_loop(0, 32, body, (one(spec, batch), a))
    return res


def pow2k(spec: FieldSpec, a: jnp.ndarray, k: int) -> jnp.ndarray:
    """a^(2^k) — k repeated squarings via fori_loop."""
    if k == 0:
        return a
    return jax.lax.fori_loop(0, k, lambda _, x: mont_sqr(spec, x), a)


def inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """a^{-1} via Fermat (a^(p-2)); inv(0) = 0.

    The reference uses binary-ext-GCD (montgomery_backend.rs:319-378), which
    is divergent per element; on TPU the fixed mul chain wins (mul throughput
    ≫ branchy scalar code). Batches should prefer batch_inv.
    """
    return pow_const(spec, a, spec.modulus - 2)


def batch_inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Elementwise inverse of a whole batch via Montgomery's trick.

    Reference: batch_inversion (ff/src/fields/mod.rs:358-420), rayon-chunked
    there; here two log-depth associative scans (prefix & suffix products)
    + one single inversion. Zeros map to zero (reference skips zeros).
    """
    L = spec.num_limbs
    batch_shape = a.shape[1:]
    x = a.reshape(L, -1)
    n = x.shape[1]
    zmask = lb.is_zero(x)
    x = jnp.where(zmask[None], one(spec, (n,)), x)
    mul = functools.partial(mont_mul, spec)
    pre = jax.lax.associative_scan(mul, x, axis=1)
    suf = jax.lax.associative_scan(mul, x, axis=1, reverse=True)
    total_inv = inv(spec, pre[:, -1:])
    pre_ex = jnp.concatenate([one(spec, (1,)), pre[:, :-1]], axis=1)
    suf_ex = jnp.concatenate([suf[:, 1:], one(spec, (1,))], axis=1)
    out = mont_mul(spec, mont_mul(spec, pre_ex, suf_ex), total_inv)
    out = jnp.where(zmask[None], jnp.zeros_like(out), out)
    return out.reshape((L,) + batch_shape)


# ---------------------------------------------------------------------------
# legendre / sqrt
# ---------------------------------------------------------------------------

def legendre(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Legendre symbol as int32: 1 (QR), -1 (non-QR), 0 (zero).

    Reference: Field::legendre via sqrt machinery (ff/src/fields/mod.rs).
    """
    l = pow_const(spec, a, spec.mod_minus_one_div_two)
    isz = lb.is_zero(a)
    iso = is_one(spec, l)
    return jnp.where(isz, 0, jnp.where(iso, 1, -1)).astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _ts_consts(spec: FieldSpec) -> Tuple[np.ndarray, np.ndarray]:
    """Tonelli–Shanks constant tables (host-precomputed, Montgomery form).

    cs_inv[j]   = c^{-2^j}       (for the DL update), j in [0, s)
    half_inv[j] = c^{-2^(j-1)}   (sqrt accumulator), j in [1, s)
    where c = qnr^trace has exact order 2^s (qnr a certified non-residue).
    """
    p, s = spec.modulus, spec.two_adicity
    c = pow(spec.sqrt_qnr, spec.trace, p)
    cinv = pow(c, -1, p)
    cs_inv, half_inv = [], []
    x = cinv
    for j in range(s):
        cs_inv.append(spec.to_mont_int(x))
        half_inv.append(spec.to_mont_int(x))  # half_inv[j] = c^{-2^j}; used at j-1 shift
        x = (x * x) % p
    def limbify(vals):
        return np.asarray(
            [
                [(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(spec.num_limbs)]
                for v in vals
            ],
            dtype=np.uint32,
        )
    return limbify(cs_inv), limbify(half_inv)


def sqrt(spec: FieldSpec, a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched square root. Returns (root, is_square mask).

    p ≡ 3 (mod 4): single pow (reference sqrt.rs Case3Mod4).
    Otherwise: Tonelli–Shanks, solved as a bit-by-bit Pohlig–Hellman discrete
    log in the 2-Sylow subgroup — constant structure, no data-dependent
    control flow, ideal for batches (reference sqrt.rs:67-165 is the
    per-element divergent-loop version).
    """
    if spec.sqrt_mode == "3mod4":
        r = pow_const(spec, a, spec.sqrt_exp)
        ok = eq(mont_sqr(spec, r), a)
        return select(ok, r, zero(spec, a.shape[1:])), ok

    if spec.sqrt_mode == "5mod8":
        # Atkin: x = a^((p+3)/8), corrected by 2^((p-1)/4) when
        # a^((p-1)/4) = -1 (reference sqrt.rs Case5Mod8) — branchless select.
        p = spec.modulus
        batch = a.shape[1:]
        r = pow_const(spec, a, (p + 3) // 8)
        chk = pow_const(spec, a, (p - 1) // 4)
        twist = const_array(spec, pow(2, (p - 1) // 4, p), batch)
        r = select(is_one(spec, chk), r, mont_mul(spec, r, twist))
        ok = eq(mont_sqr(spec, r), a)
        return select(ok, r, zero(spec, batch)), ok

    s, t, p = spec.two_adicity, spec.trace, spec.modulus
    batch = a.shape[1:]
    cs_inv, _ = _ts_consts(spec)
    # b = a^t lies in the order-2^s subgroup; x^2 = a * b with x = a^((t+1)/2)
    b = pow_const(spec, a, t)
    x = pow_const(spec, a, (t + 1) // 2)
    onev = one(spec, batch)
    # Solve c^f = b bit by bit: f_j = [ (b·c^{-f<j})^(2^(s-1-j)) != 1 ].
    # For squares f is even (f_0 = 0) and root = x · c^{-f/2}.
    g = b
    r = x
    for j in range(s):
        d = pow2k(spec, g, s - 1 - j)
        bit = ~eq(d, onev)  # f_j set
        step = _bc(cs_inv[j], batch)
        g = select(bit, mont_mul(spec, g, step), g)
        if j >= 1:
            half = _bc(cs_inv[j - 1], batch)  # c^{-2^(j-1)} = c^{-2^j / 2}
            r = select(bit, mont_mul(spec, r, half), r)
    ok = eq(mont_sqr(spec, r), a)
    return select(ok, r, zero(spec, batch)), ok


# ---------------------------------------------------------------------------
# dot products / sums
# ---------------------------------------------------------------------------

def sum_of_products(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Σ_i a_i·b_i along a batch axis (axis counts batch dims, 0 = first
    batch axis). Reference: interleaved-reduction sum_of_products
    (montgomery_backend.rs:414-516).

    Exactness rule: ``mont_reduce(cols)`` is exact (result < p) whenever the
    represented value is < R·p, so up to k = ⌊R/p⌋ - 1 raw products (each
    < p²) can be accumulated lazily per reduction. For dense moduli
    (p ≈ R, e.g. secp256k1) k = 0 and we fall back to per-product reduction.
    """
    L = spec.num_limbs
    ax = axis + 1  # account for limb axis
    n = a.shape[ax]
    k_lazy = max(0, ((1 << spec.r_bits) // spec.modulus) - 1)
    if k_lazy < 2:
        # per-product reduction + lazy sum
        prods = mont_mul(spec, a, b)
        return tree_sum(spec, prods, axis=axis)
    parts = []
    for s0 in range(0, n, k_lazy):
        hi = min(s0 + k_lazy, n)
        cols = None
        for idx in range(s0, hi):
            ai = jnp.take(a, idx, axis=ax)
            bi = jnp.take(b, idx, axis=ax)
            c = _product_cols(spec, ai, jnp.broadcast_to(bi, ai.shape) if bi.shape != ai.shape else bi)
            cols = c if cols is None else cols + c
        parts.append(mont_reduce(spec, cols))
    out = parts[0]
    for p_ in parts[1:]:
        out = add(spec, out, p_)
    return out


def tree_sum(spec: FieldSpec, a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Field sum along a batch axis via lazy-limb accumulation.

    Elements are Montgomery forms < p with 16-bit limbs in uint32 lanes, so a
    lazy sum of up to 2^15 elements keeps the represented value < 2^15·p
    < R·p, where a single ``mont_reduce`` + ``to_mont`` restores the exact
    field sum. Reduction tree: chunks of 2^15 per level.
    """
    ax = axis + 1
    chunk = 1 << 14
    x = a
    while x.shape[ax] > 1:
        n = x.shape[ax]
        if n > chunk:
            pad = (-n) % chunk
            if pad:
                padding = [(0, 0)] * x.ndim
                padding[ax] = (0, pad)
                x = jnp.pad(x, padding)
            shp = list(x.shape)
            shp[ax : ax + 1] = [(n + pad) // chunk, chunk]
            lazy = jnp.sum(x.reshape(shp), axis=ax + 1)
        else:
            lazy = jnp.sum(x, axis=ax, keepdims=True)
        # lazy value < 2^15·p < R·p → exact double reduction
        x = to_mont(spec, mont_reduce(spec, lazy))
    return jnp.take(x, 0, axis=ax)


# ---------------------------------------------------------------------------
# jit entry points: every public op is jitted with spec (and Python-int
# parameters) static, so direct library calls compile one fused graph instead
# of dispatching hundreds of eager primitive ops.
# ---------------------------------------------------------------------------

mont_reduce = jax.jit(mont_reduce, static_argnums=0)
mont_mul = jax.jit(mont_mul, static_argnums=0)
mont_sqr = jax.jit(mont_sqr, static_argnums=0)
add = jax.jit(add, static_argnums=0)
double = jax.jit(double, static_argnums=0)
sub = jax.jit(sub, static_argnums=0)
neg = jax.jit(neg, static_argnums=0)
to_mont = jax.jit(to_mont, static_argnums=0)
from_mont = jax.jit(from_mont, static_argnums=0)
pow_const = jax.jit(pow_const, static_argnums=(0, 2))
pow_u32 = jax.jit(pow_u32, static_argnums=0)
pow2k = jax.jit(pow2k, static_argnums=(0, 2))
inv = jax.jit(inv, static_argnums=0)
batch_inv = jax.jit(batch_inv, static_argnums=0)
legendre = jax.jit(legendre, static_argnums=0)
sqrt = jax.jit(sqrt, static_argnums=0)
sum_of_products = jax.jit(sum_of_products, static_argnums=(0, 3))
tree_sum = jax.jit(tree_sum, static_argnums=(0, 2))
