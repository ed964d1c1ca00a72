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
from zkarray.ec import sw_ext
from zkarray.ec.point_serde import _y_is_negative
from zkarray.ec.sw import AffinePoints
from zkarray.ff import fp
from zkarray.ff.towers import quad_sqrt

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


# ---------------------------------------------------------------------------
# G2 (Fq2 coordinates): x = c1 BE ‖ c0 BE, 96 B compressed / 192 B
# uncompressed; flags in the first byte of c1.
# Reference: read_g2_compressed/read_g2_uncompressed and the G2 serializer
# (curves/bls12_381/src/curves/util.rs:174-256, curves/g2.rs:142-160).
# ---------------------------------------------------------------------------


def _fq2_is_larger(y) -> np.ndarray:
    """y > -y with arkworks' Fq2 ordering: c1-dominant lexicographic
    (quadratic_extension.rs:444-453)."""
    c0, c1 = y[0], y[1]
    c1_gt = _y_is_negative(b381.FQ, c1)
    c1_zero = np.asarray(fp.is_zero(b381.FQ, c1))
    c0_gt = _y_is_negative(b381.FQ, c0)
    return np.where(c1_zero, c0_gt, c1_gt)


def serialize_g2(pts: sw_ext.ExtAffine, compress: bool = True) -> np.ndarray:
    F2 = b381.FQ2
    inf = np.asarray(pts.inf)
    batch = pts.x.shape[2:]
    xz = F2.select(pts.inf, F2.zero(batch), pts.x)
    xb = np.concatenate([_fq_to_be(xz[1]), _fq_to_be(xz[0])], axis=1)  # c1‖c0
    if compress:
        out = xb.copy()
        out[:, 0] |= COMPRESSED_FLAG
        sort = _fq2_is_larger(pts.y) & ~inf
        out[:, 0] |= np.where(sort, SORT_FLAG, 0).astype(np.uint8)
        out[:, 0] |= np.where(inf, INFINITY_FLAG, 0).astype(np.uint8)
        return out
    yz = F2.select(pts.inf, F2.zero(batch), pts.y)
    out = np.concatenate([xb, _fq_to_be(yz[1]), _fq_to_be(yz[0])], axis=1)
    out[:, 0] |= np.where(inf, INFINITY_FLAG, 0).astype(np.uint8)
    return out


def _be_to_fq2(data: np.ndarray):
    """(n, 96) BE bytes (c1‖c0) -> ((2, L, n) mont array, valid mask)."""
    c1, ok1 = _be_to_fq(data[:, :48])
    c0, ok0 = _be_to_fq(data[:, 48:96])
    return jnp.stack([c0, c1]), ok0 & ok1


def deserialize_g2(
    data: np.ndarray, compress: bool = True, validate: bool = True
) -> Tuple[sw_ext.ExtAffine, np.ndarray]:
    F2 = b381.FQ2
    curve = b381.G2
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
        x, ltp = _be_to_fq2(data[:, :96])
        ok &= ltp
        # y² = x³ + b, b = 4(u+1)
        rhs = F2.add(
            F2.mul(F2.sqr(x), x), F2.const(curve.b_host, (n,))
        )
        root, is_sq = quad_sqrt(F2, rhs)
        larger_mask = _fq2_is_larger(root)
        y_small = F2.select(jnp.asarray(larger_mask), F2.neg(root), root)
        y = F2.select(jnp.asarray(sort), F2.neg(y_small), y_small)
        pts = sw_ext.ExtAffine(x, y, jnp.asarray(is_inf))
        ok &= np.asarray(is_sq) | is_inf
        ok &= ~(is_inf & sort)
    else:
        ok &= ~is_comp
        x, lx = _be_to_fq2(data[:, :96])
        y, ly = _be_to_fq2(data[:, 96:192])
        ok &= lx & ly
        pts = sw_ext.ExtAffine(x, y, jnp.asarray(is_inf))
        if validate:
            ok &= np.asarray(sw_ext.is_on_curve(curve, pts)) | is_inf
    if validate:
        # ψ-endomorphism fast subgroup check (reference g2.rs:75-88)
        from zkarray.ec import fast_checks

        ok &= np.asarray(fast_checks.bls12_381_g2_subgroup_check(curve, pts))
    return pts, ok
