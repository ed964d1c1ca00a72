"""Sparse polynomials: univariate (degree, coeff) pairs and multivariate
SparseTerm polynomials.

Reference analog: poly/src/polynomial/univariate/sparse.rs and
poly/src/polynomial/multivariate/{mod.rs, sparse.rs}. Sparse evaluation maps
to batched pow (pow_u32 over the exponent array) + a lazy tree sum — no
per-term control flow.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.core.fieldspec import FieldSpec
from zkarray.ff import fp


# ---- univariate sparse: (degrees int32 (k,), coeffs (L, k)) ----

def uv_from_terms(spec: FieldSpec, terms: Sequence[Tuple[int, int]]):
    """[(degree, coeff_int)] -> (degrees, coeffs)."""
    terms = sorted(terms)
    degs = jnp.asarray(np.asarray([d for d, _ in terms], dtype=np.uint32))
    coeffs = fp.from_ints(spec, [c for _, c in terms])
    return degs, coeffs


@functools.partial(jax.jit, static_argnums=0)
def uv_evaluate(spec: FieldSpec, degrees, coeffs, tau: jnp.ndarray) -> jnp.ndarray:
    """Σ c_i τ^{d_i}, batched over tau points (L, m) -> (L, m)."""
    m = tau.shape[1]
    k = coeffs.shape[1]
    # τ^{d_i} for all (term, point): (L, k, m)
    powers = fp.pow_u32(spec, tau[:, None, :], degrees[:, None])
    prods = fp.mont_mul(spec, coeffs[:, :, None], powers)
    return fp.tree_sum(spec, prods, axis=0)


def uv_to_dense(spec: FieldSpec, degrees, coeffs, length=None) -> jnp.ndarray:
    degs = np.asarray(degrees)
    n = int(degs.max()) + 1 if length is None else length
    out = jnp.zeros((spec.num_limbs, n), dtype=jnp.uint32)
    return out.at[:, jnp.asarray(degs.astype(np.int32))].add(coeffs)


# ---- multivariate sparse: terms = (vars int32 (k, max_vars) powers) ----

def mv_from_terms(spec: FieldSpec, num_vars: int, terms):
    """[(coeff_int, [(var, power), ...])] -> (powers (k, num_vars) uint32,
    coeffs (L, k)). Reference: SparseTerm (multivariate/mod.rs)."""
    k = len(terms)
    powers = np.zeros((k, num_vars), dtype=np.uint32)
    cs = []
    for i, (c, term) in enumerate(terms):
        cs.append(c)
        for v, e in term:
            powers[i, v] += e
    return jnp.asarray(powers), fp.from_ints(spec, cs)


# ---- ring ops on sparse term lists ----
# Reference: the Add/Sub/Neg impls on SparsePolynomial
# (poly/src/polynomial/univariate/sparse.rs:139-235 and
#  poly/src/polynomial/multivariate/sparse.rs:126-214): merge term lists,
# combine like terms, drop zero coefficients. Term bookkeeping is host
# metadata; coefficient combination is one batched segment-add on device.


def _combine_terms(spec: FieldSpec, keys: np.ndarray, coeffs: jnp.ndarray):
    """keys (k, d) row-keys -> unique sorted keys with coeffs summed per key
    and exact zeros dropped (one device pass + one host sync for the mask)."""
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    # segment-sum in the field: scatter-add of raw limb words is NOT a field
    # add (no carry/reduction), so accumulate by occurrence rank with fp.add
    order = np.argsort(inv, kind="stable")
    inv_sorted = inv[order]
    acc = jnp.zeros((spec.num_limbs, uniq.shape[0]), dtype=jnp.uint32)
    coeffs_sorted = coeffs[:, jnp.asarray(order.astype(np.int32))]
    # max multiplicity is small (2 for a binary op); loop over occurrence rank
    counts = np.bincount(inv_sorted, minlength=uniq.shape[0])
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for r in range(int(counts.max()) if counts.size else 0):
        sel = counts > r
        src = (starts + r)[sel]
        dst = np.nonzero(sel)[0]
        upd = fp.add(
            spec,
            acc[:, jnp.asarray(dst.astype(np.int32))],
            coeffs_sorted[:, jnp.asarray(src.astype(np.int32))],
        )
        acc = acc.at[:, jnp.asarray(dst.astype(np.int32))].set(upd)
    keep = ~np.asarray(fp.is_zero(spec, acc))
    idx = np.nonzero(keep)[0]
    return uniq[idx], acc[:, jnp.asarray(idx.astype(np.int32))]


def mv_add(spec: FieldSpec, a, b):
    """(powers, coeffs) + (powers, coeffs), like terms combined, zeros
    dropped (multivariate/sparse.rs:126-166)."""
    pa, ca = a
    pb, cb = b
    keys = np.concatenate([np.asarray(pa), np.asarray(pb)], axis=0)
    coeffs = jnp.concatenate([ca, cb], axis=1)
    uniq, acc = _combine_terms(spec, keys, coeffs)
    return jnp.asarray(uniq), acc


def mv_neg(spec: FieldSpec, a):
    pa, ca = a
    return pa, fp.neg(spec, ca)


def mv_sub(spec: FieldSpec, a, b):
    return mv_add(spec, a, mv_neg(spec, b))


def uv_add(spec: FieldSpec, a, b):
    """Sparse univariate add (univariate/sparse.rs:139-197)."""
    da, ca = a
    db, cb = b
    keys = np.concatenate([np.asarray(da), np.asarray(db)])[:, None]
    coeffs = jnp.concatenate([ca, cb], axis=1)
    uniq, acc = _combine_terms(spec, keys, coeffs)
    return jnp.asarray(uniq[:, 0].astype(np.uint32)), acc


def uv_neg(spec: FieldSpec, a):
    d, c = a
    return d, fp.neg(spec, c)


def uv_sub(spec: FieldSpec, a, b):
    return uv_add(spec, a, uv_neg(spec, b))


@functools.partial(jax.jit, static_argnums=0)
def mv_evaluate(spec: FieldSpec, powers, coeffs, point: jnp.ndarray) -> jnp.ndarray:
    """Σ_i c_i Π_j x_j^{e_ij} at one point (L, num_vars) -> (L, 1)."""
    k, nv = powers.shape
    # x_j^{e_ij}: (L, k, nv) — broadcast the point over terms explicitly
    # (the library's trailing-pad broadcast convention doesn't cover this)
    pw = fp.pow_u32(
        spec,
        jnp.broadcast_to(point[:, None, :], (spec.num_limbs, k, nv)),
        powers,
    )
    # product over variables (log tree over axis 2)
    t = pw
    n = nv
    while n > 1:
        h = n // 2
        lo = t[:, :, :h]
        hi = t[:, :, h : 2 * h]
        red = fp.mont_mul(spec, lo, hi)
        if n % 2:
            red = jnp.concatenate([red, t[:, :, 2 * h :]], axis=2)
            n = h + 1
        else:
            n = h
        t = red
    prods = fp.mont_mul(spec, coeffs, t[:, :, 0])
    return fp.tree_sum(spec, prods, axis=0).reshape(spec.num_limbs, 1)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _geom_terms_table(spec: FieldSpec, bases: tuple, scales: tuple, n: int,
                      tree: bool = True) -> jnp.ndarray:
    """Σ_i scales_i · bases_i^j for j < n, one geometric row per term built
    by log-depth doubling with host shift constants (O(k·n) muls total).
    bases/scales: tuples of host ints (canonical)."""
    p = spec.modulus
    k = len(bases)
    T = fp.mont_mul(
        spec,
        fp.from_ints(spec, list(scales))[:, :, None],
        fp.one(spec, (k, 1)),
    )
    m = 1
    while m < n:
        shift = fp.from_ints(spec, [pow(b, m, p) for b in bases])  # (L, k)
        T = jnp.concatenate(
            [T, fp.mont_mul(spec, T[:, :, : n - m], shift[:, :, None])],
            axis=2,
        )
        m *= 2
    return fp.tree_sum(spec, T, axis=0) if tree else T


def uv_evaluate_over_domain(spec: FieldSpec, degrees, coeffs, domain) -> jnp.ndarray:
    """Sparse polynomial evaluated over a whole evaluation domain in
    O(terms·n) muls: evals[j] = Σ_i c_i·(offset·g^j)^{d_i}, with each
    term's (g^{d_i})^j a geometric sequence built by log-depth doubling —
    no densify+FFT (that costs O(n log n) and a length-deg dense copy).

    Reference: SparsePolynomial::evaluate_over_domain
    (poly/src/polynomial/univariate/sparse.rs:294-306). Returns (L, n)
    evaluations in domain order."""
    p = spec.modulus
    degs = [int(d) for d in np.asarray(degrees)]
    cs = fp.to_ints(spec, coeffs)
    bases = tuple(pow(domain.group_gen_int, d, p) for d in degs)
    scales = tuple(
        (c * pow(domain.offset_int, d, p)) % p for c, d in zip(cs, degs)
    )
    return _geom_terms_table(spec, bases, scales, domain.size)
