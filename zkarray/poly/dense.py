"""Dense univariate polynomials over (L, n) planar coefficient arrays.

Reference analog: ark-poly's DensePolynomial (poly/src/polynomial/univariate/
dense.rs:23-330): parallel Horner evaluation (chunked Horner + pow-scale
recombine, :72-92), FFT multiplication via evaluation domains,
divide_by_vanishing_poly O(n) trick (:168-211), long division
(DenseOrSparsePolynomial::divide_with_q_and_r).

Coefficient arrays carry no explicit degree; the logical degree is
``degree(coeffs)`` (highest nonzero), computed on demand. All ops are batched
field ops; evaluation uses two-level Horner so serial depth is O(√n), the
TPU-friendly version of the reference's chunked-Horner recombine.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.core import limbs as lb
from zkarray.core.fieldspec import FieldSpec
from zkarray.ff import fp
from zkarray.poly.domain import Radix2Domain, power_table


def from_ints(spec: FieldSpec, coeffs) -> jnp.ndarray:
    return fp.from_ints(spec, coeffs)


def degree(spec: FieldSpec, coeffs: jnp.ndarray) -> int:
    """Host-side degree (highest nonzero coefficient; 0 for zero poly)."""
    nz = ~np.asarray(fp.is_zero(spec, coeffs))
    idx = np.nonzero(nz)[0]
    return int(idx[-1]) if idx.size else 0


@functools.partial(jax.jit, static_argnums=0)
def evaluate(spec: FieldSpec, coeffs: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
    """Evaluate at a batch of points tau (L, m) -> (L, m).

    Two-level Horner: inner Horner over chunks of size k (serial k), outer
    Horner over n/k chunk values in τ^k (serial n/k); k ≈ √n.
    """
    L = spec.num_limbs
    n = coeffs.shape[1]
    m = tau.shape[1]
    if n == 1:
        return jnp.broadcast_to(coeffs[:, 0:1], (L, m))
    k = max(1, 1 << (int(math.log2(max(n, 2))) // 2))
    nc = -(-n // k)
    pad = nc * k - n
    c = jnp.pad(coeffs, ((0, 0), (0, pad)))
    c = c.reshape(L, nc, k)  # chunk j holds coeffs [j·k, j·k+k)

    # inner Horner over each chunk at all points: serial over k
    def inner(i, acc):
        # acc: (L, nc, m); coefficient index k-1-i
        ci = jax.lax.dynamic_index_in_dim(c, k - 1 - i, axis=2, keepdims=False)
        return fp.add(
            spec, fp.mont_mul(spec, acc, tau[:, None, :]), ci[:, :, None]
        )

    acc = jax.lax.fori_loop(
        0, k, inner, fp.zero(spec, (nc, m))
    )  # (L, nc, m): chunk_j(τ)
    # outer Horner over chunks in τ^k
    tk = fp.pow_const(spec, tau, k)

    def outer(j, r):
        cj = jax.lax.dynamic_index_in_dim(acc, nc - 1 - j, axis=1, keepdims=False)
        return fp.add(spec, fp.mont_mul(spec, r, tk), cj)

    return jax.lax.fori_loop(0, nc, outer, fp.zero(spec, (m,)))


def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    n = max(a.shape[1], b.shape[1])
    a = jnp.pad(a, ((0, 0), (0, n - a.shape[1])))
    b = jnp.pad(b, ((0, 0), (0, n - b.shape[1])))
    return fp.add(spec, a, b)


def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    n = max(a.shape[1], b.shape[1])
    a = jnp.pad(a, ((0, 0), (0, n - a.shape[1])))
    b = jnp.pad(b, ((0, 0), (0, n - b.shape[1])))
    return fp.sub(spec, a, b)


def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return fp.neg(spec, a)


def scale(spec: FieldSpec, a: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    return fp.mont_mul(spec, a, s.reshape(spec.num_limbs, 1))


def naive_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """O(n²) schoolbook product (reference dense.rs naive_mul) — small inputs
    / FFT-unfriendly fields."""
    na, nb = a.shape[1], b.shape[1]
    out = fp.zero(spec, (na + nb - 1,))
    for i in range(na):
        prod = fp.mont_mul(spec, a[:, i : i + 1], b)
        padded = jnp.pad(prod, ((0, 0), (i, na - 1 - i)))
        out = fp.add(spec, out, padded)
    return out


def mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """FFT multiplication via a shared evaluation domain (reference
    dense.rs Mul via domains)."""
    na, nb = a.shape[1], b.shape[1]
    target = na + nb - 1
    if target <= 16:
        return naive_mul(spec, a, b)[:, :target]
    n = 1 << (target - 1).bit_length()
    dom = Radix2Domain(spec, n)
    ea = dom.fft(a)
    eb = dom.fft(b)
    return dom.ifft(fp.mont_mul(spec, ea, eb))[:, :target]


def mul_by_vanishing_poly(spec: FieldSpec, a: jnp.ndarray, domain_size: int) -> jnp.ndarray:
    """a(x)·(x^n - 1): shift-and-subtract (reference dense.rs)."""
    shifted = jnp.pad(a, ((0, 0), (domain_size, 0)))
    neg_a = jnp.pad(fp.neg(spec, a), ((0, 0), (0, domain_size)))
    return fp.add(spec, shifted, neg_a)


def divide_by_vanishing_poly(
    spec: FieldSpec, coeffs: jnp.ndarray, domain_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(quotient, remainder) of division by Z_H = x^n − 1.

    O(n) trick (reference dense.rs:168-211): q[i] = Σ_{j≥0} c[i + n(j+1)],
    computed high-to-low as suffix sums with stride n; r = c_low + q.
    """
    n = domain_size
    m = coeffs.shape[1]
    if m <= n:
        return fp.zero(spec, (1,)), coeffs
    qlen = m - n
    # stripes: c[n + i], c[2n + i], ... accumulate high→low
    nstripes = -(-qlen // n)
    pad = nstripes * n - qlen
    hi = jnp.pad(coeffs[:, n:], ((0, 0), (0, pad)))  # (L, nstripes·n)
    hi = hi.reshape(spec.num_limbs, nstripes, n)
    # q stripe s = Σ_{t ≥ s} c_stripe_t  → reverse-cumulative over stripe axis
    q_stripes = jax.lax.associative_scan(
        lambda x, y: fp.add(spec, x, y), hi, axis=1, reverse=True
    )
    q = q_stripes.reshape(spec.num_limbs, nstripes * n)[:, :qlen]
    r = fp.add(spec, coeffs[:, :n], jnp.pad(q, ((0, 0), (0, n - min(n, qlen))))[:, :n])
    return q, r


def divide_with_q_and_r(
    spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Polynomial long division a = q·b + r, deg r < deg b.

    Reference: DenseOrSparsePolynomial::divide_with_q_and_r (poly/src/
    polynomial/univariate/mod.rs). Inherently serial in deg(a)-deg(b); runs
    as a scan over quotient coefficients.
    """
    da = degree(spec, a)
    db = degree(spec, b)
    if da < db:
        return fp.zero(spec, (1,)), a
    lead_inv = fp.inv(spec, b[:, db : db + 1])
    qlen = da - db + 1
    rem0 = a[:, : da + 1]
    bvec = b[:, : db + 1]

    def body(rem, i):
        pos = da - i  # degree of current leading term (traced)
        lead = jax.lax.dynamic_slice_in_dim(rem, pos, 1, axis=1)
        qi = fp.mont_mul(spec, lead, lead_inv)
        sub_poly = fp.mont_mul(spec, qi, bvec)  # (L, db+1)
        full = jnp.pad(sub_poly, ((0, 0), (0, da - db)))
        full = _shift_right(full, pos - db, da + 1)
        rem = fp.sub(spec, rem, full)
        return rem, qi[:, 0]

    rem, qs = jax.lax.scan(body, rem0, jnp.arange(qlen))
    q = jnp.moveaxis(qs, 0, 1)[:, ::-1]  # emitted high→low
    return q, rem[:, :db] if db > 0 else fp.zero(spec, (1,))


def _shift_right(arr, k, total):
    """Shift (L, total) right by traced k (zero fill)."""
    L = arr.shape[0]
    idx = jnp.arange(total)[None, :] - k
    take = jnp.clip(idx, 0, total - 1)
    vals = jnp.take_along_axis(arr, jnp.broadcast_to(take, arr.shape), axis=1)
    return jnp.where(idx >= 0, vals, 0)
