"""BLS12-381 zcash/zkcrypto wire format (the format BLS12-381 uses in the
reference: curves/bls12_381/src/curves/util.rs overrides the default
arkworks encoding).

Big-endian field bytes; flags in the top bits of the FIRST byte:
0x80 = compressed, 0x40 = infinity, 0x20 = y is lexicographically largest.
G1: 48 B compressed / 96 B uncompressed. G2: 96 / 192 (x = c1 BE ++ c0 BE).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from zkarray.curves import bls12_381 as b381
from zkarray.ec import sw as sw_mod
from zkarray.ec.point_serde import _y_is_negative
from zkarray.ec.sw import AffinePoints
from zkarray.ff import fp

COMPRESSED_FLAG = 0x80
INFINITY_FLAG = 0x40
SORT_FLAG = 0x20


def _fq_to_be(x) -> np.ndarray:
    """(L, n) mont -> (n, 48) big-endian bytes."""
    canon = np.asarray(fp.from_mont(b381.FQ, x))  # (L, n) 16-bit limbs LE
    L, n = canon.shape
    le = np.zeros((n, 2 * L), dtype=np.uint8)
    c = canon.T
    le[:, 0::2] = c & 0xFF
    le[:, 1::2] = (c >> 8) & 0xFF
    return le[:, :48][:, ::-1]  # LE bytes → truncate → reverse to BE


def _be_to_fq(data: np.ndarray):
    """(n, 48) BE bytes -> (mont array, valid<p mask)."""
    le = np.ascontiguousarray(data[:, ::-1])
    n = le.shape[0]
    L = b381.FQ.num_limbs
    buf = np.zeros((n, 2 * L), dtype=np.uint8)
    buf[:, :48] = le
    lo = buf[:, 0::2].astype(np.uint32)
    hi = buf[:, 1::2].astype(np.uint32)
    limbs = np.ascontiguousarray((lo | (hi << 8)).T)
    p_limbs = np.asarray(b381.FQ.modulus_limbs, dtype=np.uint32)
    lt = np.zeros(n, dtype=bool)
    dec = np.zeros(n, dtype=bool)
    for i in range(L - 1, -1, -1):
        lt |= (~dec) & (limbs[i] < p_limbs[i])
        dec |= limbs[i] != p_limbs[i]
    return fp.to_mont(b381.FQ, jnp.asarray(limbs)), lt


def serialize_g1(pts: AffinePoints, compress: bool = True) -> np.ndarray:
    inf = np.asarray(pts.inf)
    f = b381.FQ
    xz = fp.select(pts.inf, fp.zero(f, pts.x.shape[1:]), pts.x)
    xb = _fq_to_be(xz)
    if compress:
        out = xb.copy()
        out[:, 0] |= COMPRESSED_FLAG
        sort = _y_is_negative(f, pts.y) & ~inf
        out[:, 0] |= np.where(sort, SORT_FLAG, 0).astype(np.uint8)
        out[:, 0] |= np.where(inf, INFINITY_FLAG, 0).astype(np.uint8)
        return out
    yz = fp.select(pts.inf, fp.zero(f, pts.y.shape[1:]), pts.y)
    out = np.concatenate([xb, _fq_to_be(yz)], axis=1)
    out[:, 0] |= np.where(inf, INFINITY_FLAG, 0).astype(np.uint8)
    return out


def deserialize_g1(
    data: np.ndarray, compress: bool = True, validate: bool = True
) -> Tuple[AffinePoints, np.ndarray]:
    f = b381.FQ
    data = np.asarray(data, dtype=np.uint8)
    if data.ndim == 1:
        data = data[None]
    data = data.copy()
    n = data.shape[0]
    flags = data[:, 0] & 0xE0
    is_comp = (flags & COMPRESSED_FLAG) != 0
    is_inf = (flags & INFINITY_FLAG) != 0
    sort = (flags & SORT_FLAG) != 0
    data[:, 0] &= 0x1F
    ok = np.ones(n, dtype=bool)
    if compress:
        ok &= is_comp
        x, ltp = _be_to_fq(data[:, :48])
        ok &= ltp
        rhs = fp.add(
            f, fp.mont_mul(f, fp.mont_sqr(f, x), x), fp.const_array(f, 4, (n,))
        )
        root, is_sq = fp.sqrt(f, rhs)
        larger_mask = _y_is_negative(f, root)
        y_small = fp.select(jnp.asarray(larger_mask), fp.neg(f, root), root)
        y = fp.select(jnp.asarray(sort), fp.neg(f, y_small), y_small)
        pts = AffinePoints(x, y, jnp.asarray(is_inf))
        ok &= np.asarray(is_sq) | is_inf
        ok &= ~(is_inf & sort)
    else:
        ok &= ~is_comp
        x, lx = _be_to_fq(data[:, :48])
        y, ly = _be_to_fq(data[:, 48:96])
        ok &= lx & ly
        pts = AffinePoints(x, y, jnp.asarray(is_inf))
        if validate:
            ok &= np.asarray(sw_mod.is_on_curve(b381.G1, pts))
    if validate:
        # endomorphism check (φ(P) == −[X²]P) — the reference's fast path
        # for this consensus-critical branch (bls12_381/g1.rs:69-85)
        from zkarray.ec import fast_checks

        ok &= np.asarray(fast_checks.bls12_381_g1_subgroup_check(b381.G1, pts))
    return pts, ok
