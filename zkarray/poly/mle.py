"""Dense multilinear extensions (sumcheck building block).

Reference analog: ark-poly's DenseMultilinearExtension
(poly/src/evaluations/multivariate/multilinear/{mod.rs:47-96, dense.rs:
25-200+}): evaluation table over {0,1}^k in little-endian index order
(variable j = bit j), fix_variables folds adjacent pairs
lo + r·(hi − lo) — on TPU a reshape + one batched mul per variable.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.core.fieldspec import FieldSpec
from zkarray.ff import fp


def num_vars(evals: jnp.ndarray) -> int:
    n = evals.shape[1]
    k = n.bit_length() - 1
    assert 1 << k == n, "evaluation table must have power-of-two size"
    return k


@functools.partial(jax.jit, static_argnums=0)
def fix_variables(spec: FieldSpec, evals: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Fix the first m variables to ``points`` (L, m) — returns the folded
    table (L, 2^(k-m)). Reference: dense.rs fix_variables."""
    L = spec.num_limbs
    m = points.shape[1]
    x = evals
    for j in range(m):
        n = x.shape[1]
        r = points[:, j : j + 1]
        pairs = x.reshape(L, n // 2, 2)
        lo, hi = pairs[:, :, 0], pairs[:, :, 1]
        x = fp.add(spec, lo, fp.mont_mul(spec, fp.sub(spec, hi, lo), r))
    return x


def evaluate(spec: FieldSpec, evals: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Full evaluation at one point (L, k) -> (L, 1)."""
    assert point.shape[1] == num_vars(evals)
    return fix_variables(spec, evals, point)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def relabel(spec: FieldSpec, evals: jnp.ndarray, a: int, b: int, k: int) -> jnp.ndarray:
    """Swap variable blocks [a, a+k) and [b, b+k) (reference mod.rs relabel
    / swap_bits)."""
    nv = num_vars(evals)
    idx = np.arange(1 << nv)
    amask = ((1 << k) - 1) << a
    bmask = ((1 << k) - 1) << b
    abits = (idx & amask) >> a
    bbits = (idx & bmask) >> b
    new = (idx & ~amask & ~bmask) | (abits << b) | (bbits << a)
    return jnp.take(evals, jnp.asarray(new, dtype=jnp.int32), axis=1)


def concat(spec: FieldSpec, polys: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Concatenate MLE tables (zero-padded to a power of two) — reference
    mod.rs concat."""
    total = sum(p.shape[1] for p in polys)
    n = 1 << (total - 1).bit_length()
    out = jnp.concatenate(list(polys), axis=1)
    return jnp.pad(out, ((0, 0), (0, n - total)))


def add(spec, a, b):
    return fp.add(spec, a, b)


def sub(spec, a, b):
    return fp.sub(spec, a, b)


def mul(spec, a, b):
    """Pointwise product of evaluation tables (quadratic poly per pair of
    MLEs — caller's responsibility, as in sumcheck provers)."""
    return fp.mont_mul(spec, a, b)


def eq_table(spec: FieldSpec, r: jnp.ndarray) -> jnp.ndarray:
    """eq(x, r) table over {0,1}^k: Π_j (x_j r_j + (1-x_j)(1-r_j)).

    Built by the doubling construction (k batched muls); used by sparse-MLE
    evaluation (reference sparse.rs precomputed eq windows).
    """
    L = spec.num_limbs
    k = r.shape[1]
    t = fp.one(spec, (1,))
    for j in range(k):
        rj = r[:, j : j + 1]
        one_minus = fp.sub(spec, fp.one(spec, (1,)), rj)
        t = jnp.concatenate(
            [fp.mont_mul(spec, t, one_minus), fp.mont_mul(spec, t, rj)], axis=1
        )
        # bit j is the LSB of the new index half: index order must be LE —
        # new index = old | (bit_j << j); concat above appends bit_j as MSB
        # of the current table, which IS position j for a table of size 2^j.
    return t


@functools.partial(jax.jit, static_argnums=0)
def evaluate_sparse(
    spec: FieldSpec, indices: jnp.ndarray, values: jnp.ndarray, point: jnp.ndarray
) -> jnp.ndarray:
    """Sparse MLE evaluation: Σ_i v_i · eq(bits(idx_i), point).

    Reference: SparseMultilinearExtension::evaluate (sparse.rs) with the
    eq-table gather replacing the hashmap walk.
    """
    tbl = eq_table(spec, point)  # (L, 2^k)
    gathered = jnp.take(tbl, indices, axis=1)
    return fp.tree_sum(spec, fp.mont_mul(spec, gathered, values), axis=0).reshape(
        spec.num_limbs, 1
    )


# ---------------------------------------------------------------------------
# sparse MLE (reference: .../multilinear/sparse.rs)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 4))
def fix_variables_sparse(
    spec: FieldSpec,
    indices: jnp.ndarray,
    values: jnp.ndarray,
    points: jnp.ndarray,
    num_fixed: int,
):
    """Fix the first ``num_fixed`` variables of a sparse MLE to ``points``
    (L, num_fixed). Returns (new_indices, new_values) over the remaining
    variables; entries with equal index MAY repeat (multiset semantics —
    evaluate_sparse and sparse_to_dense sum duplicates, so all downstream
    ops agree with the reference's hashmap-merging fix_variables,
    sparse.rs). Weight of entry i: eq(low bits of idx_i, points)."""
    tbl = eq_table(spec, points)  # (L, 2^m)
    low = indices & ((1 << num_fixed) - 1)
    w = jnp.take(tbl, low, axis=1)  # (L, nnz)
    return indices >> num_fixed, fp.mont_mul(spec, values, w)


@functools.partial(jax.jit, static_argnums=(0, 3))
def sparse_to_dense(
    spec: FieldSpec, indices: jnp.ndarray, values: jnp.ndarray, nv: int
) -> jnp.ndarray:
    """Sparse MLE -> dense evaluation table (L, 2^nv), summing duplicate
    indices (reference sparse.rs to_dense_multilinear_extension)."""
    n = 1 << nv
    onehot = indices[None, :] == jnp.arange(n, dtype=indices.dtype)[:, None]
    # (n, nnz) mask; select values where the mask holds, then tree-sum nnz
    sel = fp.select(
        onehot,
        jnp.broadcast_to(values[:, None, :], (spec.num_limbs, n, values.shape[1])),
        fp.zero(spec, (n, values.shape[1])),
    )
    return fp.tree_sum(spec, sel, axis=1)
