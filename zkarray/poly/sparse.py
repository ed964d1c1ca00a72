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


@functools.partial(jax.jit, static_argnums=0)
def mv_evaluate(spec: FieldSpec, powers, coeffs, point: jnp.ndarray) -> jnp.ndarray:
    """Σ_i c_i Π_j x_j^{e_ij} at one point (L, num_vars) -> (L, 1)."""
    k, nv = powers.shape
    # x_j^{e_ij}: (L, k, nv)
    pw = fp.pow_u32(spec, point[:, None, :], powers[None, :, :])
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
