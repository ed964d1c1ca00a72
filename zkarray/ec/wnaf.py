"""wNAF scalar multiplication context.

Reference analog: WnafContext (ec/src/scalar_mul/wnaf.rs:7-100): a table of
2^(w-1) odd multiples of the base plus signed-digit (wNAF) recoding; useful
when multiplying ONE base by many scalars. Recoding is host-side (Python
ints, boundary work); digit application is a batched device scan with table
gather — the reference's per-scalar loop becomes one scan across the batch.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.core.bigint import find_wnaf
from zkarray.core import limbs as lb
from zkarray.ec import sw
from zkarray.ec.sw import AffinePoints, JacobianPoints, SWCurveSpec
from zkarray.ff import fp


class WnafContext:
    def __init__(self, curve: SWCurveSpec, base_xy, window: int = 4):
        """base_xy: (x, y) canonical ints. Table: odd multiples
        [1, 3, 5, ..., 2^w - 1]·G, built host-side."""
        from zkarray.ec.fixed_base import _host_add

        self.curve = curve
        self.window = window
        a, mod = curve.a_int, curve.base.modulus
        g2 = _host_add(base_xy, base_xy, a, mod)
        odd = [base_xy]
        for _ in range((1 << (window - 1)) - 1):
            odd.append(_host_add(odd[-1], g2, a, mod))
        L = curve.base.num_limbs
        xs = np.zeros((L, len(odd)), np.uint32)
        ys = np.zeros((L, len(odd)), np.uint32)
        for j, pt in enumerate(odd):
            xs[:, j] = lb.int_to_limbs_np(curve.base.to_mont_int(pt[0]), L)
            ys[:, j] = lb.int_to_limbs_np(curve.base.to_mont_int(pt[1]), L)
        self.tx = jnp.asarray(xs)
        self.ty = jnp.asarray(ys)

    def mul(self, scalars: Sequence[int]) -> JacobianPoints:
        """k_i · base for a batch of host-int scalars."""
        w = self.window
        r = self.curve.scalar.modulus
        digit_lists = [find_wnaf(int(k) % r, w) for k in scalars]
        maxlen = max((len(d) for d in digit_lists), default=1)
        digs = np.zeros((maxlen, len(scalars)), np.int32)
        for j, d in enumerate(digit_lists):
            digs[: len(d), j] = d
        return _wnaf_apply(self.curve, self.tx, self.ty, jnp.asarray(digs))


@functools.partial(jax.jit, static_argnums=0)
def _wnaf_apply(curve, tx, ty, digits):
    """Scan digits MSB→LSB: acc = 2·acc (+ sign·table[|d|>>1])."""
    f = curve.base
    steps, n = digits.shape
    acc0 = sw.jac_zero(curve, (n,))

    def body(acc, d):
        acc = sw.jac_double(curve, acc)
        idx = jnp.abs(d) >> 1
        px = jnp.take(tx, idx, axis=1)
        py = jnp.take(ty, idx, axis=1)
        py = fp.select(d < 0, fp.neg(f, py), py)
        A = AffinePoints(px, py, d == 0)
        return sw.jac_add_mixed(curve, acc, A), None

    acc, _ = jax.lax.scan(body, acc0, digits[::-1])
    return acc
