"""Point serialization: arkworks canonical formats, batched.

Reference: SWCurveConfig::serialize_with_mode / deserialize_with_mode
(ec/src/models/short_weierstrass/mod.rs:125-193), TE equivalents
(ec/src/models/twisted_edwards/mod.rs), flag encodings
(serialization_flags.rs). Compressed SW = x bytes with SWFlags in the top 2
bits of the last byte (sign = y > -y, i.e. y lexicographically larger);
uncompressed = x bytes ++ y-with-flags. Infinity serializes as zeros + the
infinity flag.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from zkarray.ec import sw as sw_mod
from zkarray.ec import te as te_mod
from zkarray.ec.sw import AffinePoints, SWCurveSpec
from zkarray.ec.te import TEAffine, TECurveSpec
from zkarray.ff import fp
from zkarray.serialize.canonical import (
    SW_FLAG_INFINITY,
    SW_FLAG_NEGATIVE,
    TE_FLAG_NEGATIVE,
    deserialize_fp,
    field_byte_size,
    serialize_fp,
)


def _y_is_negative(spec, y) -> np.ndarray:
    """y > -y as canonical integers (lexicographically larger root)."""
    canon = np.asarray(fp.from_mont(spec, y))
    negy = np.asarray(fp.from_mont(spec, fp.neg(spec, y)))
    # compare big-endian limbwise
    L = canon.shape[0]
    gt = np.zeros(canon.shape[1:], dtype=bool)
    decided = np.zeros(canon.shape[1:], dtype=bool)
    for i in range(L - 1, -1, -1):
        gt |= (~decided) & (canon[i] > negy[i])
        decided |= canon[i] != negy[i]
    return gt


def serialize_sw(curve: SWCurveSpec, pts: AffinePoints, compress: bool = True) -> np.ndarray:
    f = curve.base
    inf = np.asarray(pts.inf)
    xz = fp.select(pts.inf, fp.zero(f, pts.x.shape[1:]), pts.x)
    flags = np.where(
        inf,
        np.uint8(SW_FLAG_INFINITY),
        np.where(_y_is_negative(f, pts.y), np.uint8(SW_FLAG_NEGATIVE), np.uint8(0)),
    )
    if compress:
        return serialize_fp(f, xz, flag_bits=2, flags=flags)
    xb = serialize_fp(f, xz, flag_bits=0)
    yz = fp.select(pts.inf, fp.zero(f, pts.y.shape[1:]), pts.y)
    yb = serialize_fp(f, yz, flag_bits=2, flags=flags)
    return np.concatenate([xb, yb], axis=1)


def deserialize_sw(
    curve: SWCurveSpec, data: np.ndarray, compress: bool = True, validate: bool = True
) -> Tuple[AffinePoints, np.ndarray]:
    """-> (points, valid mask). Invalid: bad flags, x not on curve (compressed),
    not on curve / not in subgroup (validate, uncompressed)."""
    f = curve.base
    data = np.asarray(data, dtype=np.uint8)
    if data.ndim == 1:
        data = data[None]
    n = data.shape[0]
    if compress:
        x, flags, ok = deserialize_fp(f, data, flag_bits=2)
        is_inf = (flags & SW_FLAG_INFINITY) != 0
        neg = (flags & SW_FLAG_NEGATIVE) != 0
        bad_flag = is_inf & neg  # only one way to serialize infinity
        # y² = x³ + ax + b
        rhs = fp.add(f, fp.mont_mul(f, fp.mont_sqr(f, x), x), fp.const_array(f, curve.b_int, (n,)))
        if not curve.a_is_zero:
            rhs = fp.add(f, rhs, fp.mont_mul(f, fp.const_array(f, curve.a_int, ()), x))
        root, is_sq = fp.sqrt(f, rhs)
        # pick smaller root as "positive": root vs -root
        root_neg = fp.neg(f, root)
        root_is_larger = _y_is_negative(f, root)
        y_pos = fp.select(jnp.asarray(root_is_larger), root_neg, root)
        y_neg_v = fp.neg(f, y_pos)
        y = fp.select(jnp.asarray(neg), y_neg_v, y_pos)
        pts = AffinePoints(x, y, jnp.asarray(is_inf))
        ok = ok & (np.asarray(is_sq) | is_inf) & ~bad_flag
    else:
        nb = field_byte_size(f)
        x, _, okx = deserialize_fp(f, data[:, :nb], flag_bits=0)
        y, flags, oky = deserialize_fp(f, data[:, nb:], flag_bits=2)
        is_inf = (flags & SW_FLAG_INFINITY) != 0
        pts = AffinePoints(x, y, jnp.asarray(is_inf))
        ok = okx & oky
        if validate:
            ok = ok & np.asarray(sw_mod.is_on_curve(curve, pts))
    if validate:
        ok = ok & np.asarray(sw_mod.subgroup_check(curve, pts))
    return pts, ok


def serialize_te(curve: TECurveSpec, pts: TEAffine, compress: bool = True) -> np.ndarray:
    """TE compression: y bytes + sign-of-x flag (reference twisted_edwards/
    mod.rs + TEFlags)."""
    f = curve.base
    flags = np.where(
        _y_is_negative(f, pts.x), np.uint8(TE_FLAG_NEGATIVE), np.uint8(0)
    )
    if compress:
        return serialize_fp(f, pts.y, flag_bits=1, flags=flags)
    xb = serialize_fp(f, pts.x, flag_bits=0)
    yb = serialize_fp(f, pts.y, flag_bits=1, flags=flags)
    return np.concatenate([xb, yb], axis=1)


def deserialize_te(
    curve: TECurveSpec, data: np.ndarray, compress: bool = True, validate: bool = True
) -> Tuple[TEAffine, np.ndarray]:
    f = curve.base
    data = np.asarray(data, dtype=np.uint8)
    if data.ndim == 1:
        data = data[None]
    if compress:
        y, flags, ok = deserialize_fp(f, data, flag_bits=1)
        neg = (flags & TE_FLAG_NEGATIVE) != 0
        # a x² + y² = 1 + d x² y² → x² = (y² - 1)/(d y² - a)
        y2 = fp.mont_sqr(f, y)
        num = fp.sub(f, y2, fp.one(f, y2.shape[1:]))
        den = fp.sub(
            f,
            fp.mont_mul(f, fp.const_array(f, curve.d_int, ()), y2),
            fp.const_array(f, curve.a_int, y2.shape[1:]),
        )
        x2 = fp.mont_mul(f, num, fp.batch_inv(f, den))
        root, is_sq = fp.sqrt(f, x2)
        root_neg = fp.neg(f, root)
        larger = _y_is_negative(f, root)
        x_pos = fp.select(jnp.asarray(larger), root_neg, root)
        x = fp.select(jnp.asarray(neg), fp.neg(f, x_pos), x_pos)
        pts = TEAffine(x, y)
        ok = ok & np.asarray(is_sq)
    else:
        nb = field_byte_size(f)
        x, _, okx = deserialize_fp(f, data[:, :nb], flag_bits=0)
        y, _, oky = deserialize_fp(f, data[:, nb:], flag_bits=1)
        pts = TEAffine(x, y)
        ok = okx & oky
    if validate:
        ok = ok & np.asarray(te_mod.is_on_curve(curve, pts))
    return pts, ok


# ---------------------------------------------------------------------------
# extension-field SW points (G2 et al.) — arkworks default canonical format
# ---------------------------------------------------------------------------

def _ext_y_is_negative(F, y) -> np.ndarray:
    """y > -y with arkworks' extension-field ordering: coefficient-
    lexicographic, HIGHEST coefficient dominant (quadratic_extension.rs:
    444-453; cubic_extension.rs has the same shape)."""
    spec = F.spec
    deg = F.deg
    gt = np.zeros(np.asarray(y[0]).shape[1:], dtype=bool)
    decided = np.zeros_like(gt)
    for j in range(deg - 1, -1, -1):
        cj = y[j]
        c_gt = _y_is_negative(spec, cj)
        c_zero = np.asarray(fp.is_zero(spec, cj))
        gt |= (~decided) & c_gt
        decided |= ~c_zero
    return gt


def serialize_sw_ext(curve, pts, compress: bool = True) -> np.ndarray:
    """ExtAffine points over a quadratic/cubic extension -> canonical bytes.

    Arkworks format (ec/src/models/short_weierstrass/mod.rs:125-146 +
    quadratic_extension.rs:687-695): coefficients c0..c_{deg-1} as plain LE
    field bytes, SWFlags in the top 2 bits of the LAST coefficient's last
    byte; infinity = all-zero with the infinity flag.
    """
    F = curve.ops
    spec = F.spec
    deg = F.deg
    batch = F.batch_shape_of(pts.x)
    inf = np.asarray(pts.inf)
    xz = F.select(pts.inf, F.zero(batch), pts.x)
    flags = np.where(
        inf,
        np.uint8(SW_FLAG_INFINITY),
        np.where(_ext_y_is_negative(F, pts.y), np.uint8(SW_FLAG_NEGATIVE), np.uint8(0)),
    )

    def enc(v, with_flags):
        parts = [serialize_fp(spec, v[j], flag_bits=0) for j in range(deg - 1)]
        if with_flags:
            parts.append(serialize_fp(spec, v[deg - 1], flag_bits=2, flags=flags))
        else:
            parts.append(serialize_fp(spec, v[deg - 1], flag_bits=0))
        return np.concatenate(parts, axis=1)

    if compress:
        return enc(xz, True)
    yz = F.select(pts.inf, F.zero(batch), pts.y)
    return np.concatenate([enc(xz, False), enc(yz, True)], axis=1)


def deserialize_sw_ext(curve, data: np.ndarray, compress: bool = True,
                       validate: bool = True):
    """Canonical bytes -> (ExtAffine, valid mask). Compressed decoding of
    quadratic extensions uses the norm-trick sqrt (towers.quad_sqrt);
    cubic-extension compressed decoding is not implemented (use
    compress=False — the reference's G2-over-Fp3 curves are supported
    uncompressed)."""
    import jax.numpy as jnp

    from zkarray.ec import sw_ext
    from zkarray.ff.towers import quad_sqrt

    F = curve.ops
    spec = F.spec
    deg = F.deg
    data = np.asarray(data, dtype=np.uint8)
    if data.ndim == 1:
        data = data[None]
    n = data.shape[0]
    nb = field_byte_size(spec)

    def dec(block, flag_bits_last):
        """block: one ext element = (deg-1)·nb plain bytes + one
        flag-carrying coefficient of field_byte_size(spec, flag_bits)."""
        coeffs, oks = [], np.ones(n, dtype=bool)
        flags = np.zeros(n, dtype=np.uint8)
        off = 0
        for j in range(deg):
            fb = flag_bits_last if j == deg - 1 else 0
            w = field_byte_size(spec, fb)
            v, fl, ok = deserialize_fp(spec, block[:, off : off + w], flag_bits=fb)
            off += w
            coeffs.append(v)
            oks &= ok
            if j == deg - 1:
                flags = fl
        return jnp.stack(coeffs), flags, oks

    if compress:
        if deg != 2:
            raise NotImplementedError(
                "compressed ext-point decoding implemented for quadratic "
                "extensions only"
            )
        x, flags, ok = dec(data, 2)
        is_inf = (flags & SW_FLAG_INFINITY) != 0
        neg = (flags & SW_FLAG_NEGATIVE) != 0
        bad_flag = is_inf & neg
        rhs = F.add(F.mul(F.sqr(x), x), F.const(curve.b_host, (n,)))
        if not curve.a_is_zero:
            rhs = F.add(rhs, F.mul(F.const(curve.a_host, (n,)), x))
        root, is_sq = quad_sqrt(F, rhs)
        root_is_larger = _ext_y_is_negative(F, root)
        y_pos = F.select(jnp.asarray(root_is_larger), F.neg(root), root)
        y = F.select(jnp.asarray(neg), F.neg(y_pos), y_pos)
        pts = sw_ext.ExtAffine(x, y, jnp.asarray(is_inf))
        ok = ok & (np.asarray(is_sq) | is_inf) & ~bad_flag
    else:
        x, _, okx = dec(data[:, : deg * nb], 0)
        y, flags, oky = dec(data[:, deg * nb :], 2)
        is_inf = (flags & SW_FLAG_INFINITY) != 0
        pts = sw_ext.ExtAffine(x, y, jnp.asarray(is_inf))
        ok = okx & oky
        if validate:
            ok = ok & (np.asarray(sw_ext.is_on_curve(curve, pts)) | is_inf)
    if validate and compress:
        ok = ok & (np.asarray(sw_ext.is_on_curve(curve, pts)) | is_inf)
    return pts, ok
