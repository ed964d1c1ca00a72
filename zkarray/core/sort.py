"""Batched bitonic key/value sort along the last axis.

Reference analog: ark-ec's MSM front-end par-sorts scalars by magnitude
class (ec/src/scalar_mul/variable_base/mod.rs:287-290) with rayon's
comparison sort; the aligned-bucket-rounds MSM (zkarray/ec/msm.py) needs the
same "group equal keys together" primitive per window.

Why not ``jax.lax.sort``: XLA:TPU's sort lowering is a memory-bound variable
sort whose compile time grows sharply with n (measured: a (26, 2^18)
sort_key_val dominates the whole MSM compile). A bitonic network is the
classic hardware-shaped alternative: log²(n)/2 merge stages, each a DENSE
compare-exchange over the full array expressed as reshape + flip + where —
static shapes, ~10 HLO ops per stage, no scatter/gather. Work is
O(n·log² n) element ops at full VPU width.

Requires n to be a power of two (callers pad; pad with +inf-like keys).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def bitonic_sort_kv(keys: jnp.ndarray, vals: jnp.ndarray):
    """Sort ``keys`` ascending along the last axis, carrying ``vals``.

    keys/vals: (..., n) arrays, n a power of two; any leading batch axes.
    Returns (sorted_keys, permuted_vals). Equal keys keep an arbitrary
    relative order (adequate for bucket grouping; not a stable sort).
    """
    n = keys.shape[-1]
    assert n & (n - 1) == 0, "bitonic_sort_kv requires power-of-two length"
    if n == 1:
        return keys, vals
    ln = n.bit_length() - 1
    idx = np.arange(n)
    lead = keys.shape[:-1]

    def stage(keys, vals, k, j):
        d = 1 << j
        shp = lead + (n // (2 * d), 2, d)
        ks = keys.reshape(shp)
        vs = vals.reshape(shp)
        kp = jnp.flip(ks, axis=-2).reshape(keys.shape)
        vp = jnp.flip(vs, axis=-2).reshape(vals.shape)
        # ascending run iff bit k of the index is 0; element is the pair's
        # "low" slot iff bit j is 0. Keep the smaller key in the low slot of
        # ascending runs (and the larger in descending ones).
        up = ((idx >> k) & 1) == 0
        low = (idx & d) == 0
        take_small = jnp.asarray(low == up)
        k_arr = keys
        swap = jnp.where(take_small, k_arr > kp, k_arr < kp)
        return (
            jnp.where(swap, kp, k_arr),
            jnp.where(swap, vp, vals),
        )

    for k in range(1, ln + 1):
        for j in range(k - 1, -1, -1):
            keys, vals = stage(keys, vals, k, j)
    return keys, vals
