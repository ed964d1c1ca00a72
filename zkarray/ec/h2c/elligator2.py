"""Elligator2 map-to-curve for Montgomery/twisted-Edwards curves.

Reference analog: ec/src/hashing/curve_maps/elligator2.rs:17-120 — RFC 9380
§6.7.1 map to the Montgomery form y'² = x'³ + A·x'² + B·x', followed by the
birational Montgomery → twisted-Edwards map. Batched, mask-selected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zkarray.ec.te import TEAffine, TECurveSpec
from zkarray.ff import fp


@functools.partial(jax.jit, static_argnums=(0, 2))
def elligator2_map(spec: TECurveSpec, u: jnp.ndarray, zeta: int) -> TEAffine:
    """u (L, n) -> points on the TE curve (cofactor NOT cleared).

    Uses the curve's Montgomery constants (spec.mont_coeff_a/b).
    """
    if spec.mont_coeff_a is None:
        raise ValueError(f"{spec.name} has no Montgomery form constants")
    f = spec.base
    batch = u.shape[1:]
    A = fp.const_array(f, spec.mont_coeff_a, ())
    B = fp.const_array(f, spec.mont_coeff_b, ())
    one = fp.one(f, batch)
    z = fp.const_array(f, zeta, ())

    # x1 = -A/(1 + Z u²) (exceptional Z u² = -1 → x1 = -A)
    zu2 = fp.mont_mul(f, z, fp.mont_sqr(f, u))
    den = fp.add(f, one, zu2)
    den_zero = fp.is_zero(f, den)
    den_safe = fp.select(den_zero, one, den)
    x1 = fp.neg(f, fp.mont_mul(f, A, fp.batch_inv(f, den_safe)))

    # Montgomery form here is B·y'² = x'³ + A·x'² + x' (the convention the
    # birational constants a=(A+2)/B, d=(A−2)/B assume, matching ark's
    # MontCurveConfig), so y'² = (x'³ + A·x'² + x')/B.
    Binv = fp.const_array(f, pow(spec.mont_coeff_b % f.modulus, -1, f.modulus), ())

    def g(x):
        x2 = fp.mont_sqr(f, x)
        num = fp.add(f, fp.add(f, fp.mont_mul(f, x2, x), fp.mont_mul(f, A, x2)), x)
        return fp.mont_mul(f, num, Binv)

    gx1 = g(x1)
    x2 = fp.sub(f, fp.neg(f, x1), A)
    gx2 = g(x2)
    r1, ok1 = fp.sqrt(f, gx1)
    r2, _ = fp.sqrt(f, gx2)
    xm = fp.select(ok1, x1, x2)
    ym = fp.select(ok1, r1, r2)
    # sign: sgn0(y) matches sgn0(u)
    u_par = fp.from_mont(f, u)[0] & 1
    y_par = fp.from_mont(f, ym)[0] & 1
    ym = fp.select(u_par == y_par, ym, fp.neg(f, ym))

    # birational map Montgomery (x', y') → TE (x, y):
    # with the reference scaling: x = x'/y' · s, y = (x'-1)/(x'+1)
    # where s² = (A+2)/B? — for curves whose TE form is exactly the standard
    # birational image, x = x'/y', y = (x'-1)/(x'+1) up to the scaling s.
    # We compute the unscaled map and fix by the curve equation: solve the
    # scale once per spec on the host.
    sc = _te_scale(spec)
    xs = fp.mont_mul(f, fp.mont_mul(f, xm, fp.batch_inv(f, ym)), fp.const_array(f, sc, ()))
    num = fp.sub(f, xm, one)
    den2 = fp.add(f, xm, one)
    d0 = fp.is_zero(f, den2)
    ys = fp.mont_mul(f, num, fp.batch_inv(f, fp.select(d0, one, den2)))
    # exceptional cases (y'=0 or x'=-1) → identity (0, 1)
    exc = fp.is_zero(f, ym) | d0 | den_zero
    xs = fp.select(exc, fp.zero(f, batch), xs)
    ys = fp.select(exc, one, ys)
    return TEAffine(xs, ys)


@functools.lru_cache(maxsize=None)
def _te_scale(spec: TECurveSpec) -> int:
    """Scale s mapping the raw birational image (a' = (A+2)/B,
    d' = (A-2)/B) onto the curve's (a, d): x → x/s with s² = a'/a.
    Derived once on the host; consistency-asserted against d."""
    p = spec.base.modulus
    A, B = spec.mont_coeff_a % p, spec.mont_coeff_b % p
    a_p = (A + 2) * pow(B, -1, p) % p
    d_p = (A - 2) * pow(B, -1, p) % p
    val = a_p * pow(spec.a_int, -1, p) % p
    s = pow(val, (p + 1) // 4, p) if p % 4 == 3 else _tonelli_host(val, p)
    assert s * s % p == val, "incompatible Montgomery constants"
    # the same scale must map d' to d (d = d'/s²)
    assert d_p * pow(val, -1, p) % p == spec.d_int, "d mismatch"
    # raw image (x', y') on (a', d') maps to (s·x', y') on (a, d)
    return s


def _tonelli_host(n, p):
    if pow(n, (p - 1) // 2, p) != 1:
        raise ValueError("not a QR")
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(n, q, p), pow(n, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c, t, r = i, b * b % p, t * b * b % p, r * b % p
    return r
