"""Fixed-base windowed batch scalar multiplication.

Reference analog: ScalarMul::batch_mul / BatchMulPreprocessing
(ec/src/scalar_mul/mod.rs:53-245): a windowed table of
outerc × 2^window multiples of the base, then per-scalar windowed
lookup-adds. The table is built host-side once (Python-int EC — cheap, done
once per base); application is a batched device gather + log-tree of adds,
replacing the reference's rayon par_iter over scalars.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.core import limbs as lb
from zkarray.ec import sw
from zkarray.ec.sw import AffinePoints, JacobianPoints, SWCurveSpec
from zkarray.ff import fp


def _host_add(p, q, a, mod):
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2 and (y1 + y2) % mod == 0:
        return None
    if p == q:
        lam = (3 * x1 * x1 + a) * pow(2 * y1, -1, mod) % mod
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, mod) % mod
    x3 = (lam * lam - x1 - x2) % mod
    return (x3, (lam * (x1 - x3) - y1) % mod)


class FixedBaseTable:
    def __init__(self, curve: SWCurveSpec, base_xy, window: int = 8):
        """base_xy: (x, y) canonical ints of the base point."""
        self.curve = curve
        self.window = window
        bits = curve.scalar.bits
        self.outerc = -(-bits // window)
        a, mod = curve.a_int, curve.base.modulus
        rows = []
        g = base_xy
        for _ in range(self.outerc):
            row = [None]
            cur = None
            for _ in range((1 << window) - 1):
                cur = _host_add(cur, g, a, mod)
                row.append(cur)
            rows.append(row)
            for _ in range(window):
                g = _host_add(g, g, a, mod)
        # device tensors: (L, outerc, 2^w) + inf mask
        L = curve.base.num_limbs
        n_per = 1 << window
        xs = np.zeros((L, self.outerc, n_per), np.uint32)
        ys = np.zeros((L, self.outerc, n_per), np.uint32)
        inf = np.zeros((self.outerc, n_per), bool)
        for r, row in enumerate(rows):
            for j, pt in enumerate(row):
                if pt is None:
                    inf[r, j] = True
                else:
                    xs[:, r, j] = lb.int_to_limbs_np(curve.base.to_mont_int(pt[0]), L)
                    ys[:, r, j] = lb.int_to_limbs_np(curve.base.to_mont_int(pt[1]), L)
        self.tx = jnp.asarray(xs)
        self.ty = jnp.asarray(ys)
        self.tinf = jnp.asarray(inf)

    def batch_mul(self, scalars: jnp.ndarray) -> JacobianPoints:
        """scalars: canonical limbs (Ls, n) -> k_i · base, batched."""
        return _apply_table(
            self.curve, self.tx, self.ty, self.tinf, scalars, self.window, self.outerc
        )


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def _apply_table(curve, tx, ty, tinf, scalars, window: int, outerc: int):
    f = curve.base
    n = scalars.shape[1]
    Ls = scalars.shape[0]
    mask = np.uint32((1 << window) - 1)
    # digits (outerc, n)
    digs = []
    for r in range(outerc):
        bitpos = r * window
        limb, off = divmod(bitpos, 16)
        raw = scalars[limb] >> off
        if off + window > 16 and limb + 1 < Ls:
            raw = raw | (scalars[limb + 1] << (16 - off))
        digs.append(raw & mask)
    # gather rows and tree-add
    pts = []
    for r in range(outerc):
        d = digs[r].astype(jnp.int32)
        px = jnp.take(tx[:, r, :], d, axis=1)
        py = jnp.take(ty[:, r, :], d, axis=1)
        pinf = jnp.take(tinf[r], d)
        pts.append(AffinePoints(px, py, pinf))
    # reduce: first to jacobian, then pairwise tree
    acc = [sw.from_affine(curve, p) for p in pts]
    while len(acc) > 1:
        nxt = []
        for i in range(0, len(acc) - 1, 2):
            nxt.append(sw.jac_add(curve, acc[i], acc[i + 1]))
        if len(acc) % 2:
            nxt.append(acc[-1])
        acc = nxt
    return acc[0]
