"""Simplified SWU map-to-curve (RFC 9380 §6.6.2), batched.

Reference analog: ec/src/hashing/curve_maps/swu.rs:15-70+. Requires a curve
with a·b ≠ 0 and a fixed non-square ZETA. All branches are computed and
mask-selected (batch-friendly; the reference branches per element).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zkarray.ec.sw import AffinePoints, SWCurveSpec
from zkarray.ff import fp


@functools.partial(jax.jit, static_argnums=(0, 2))
def swu_map(curve: SWCurveSpec, u: jnp.ndarray, zeta: int) -> AffinePoints:
    """u (L, n) field elements -> points on curve (never infinity)."""
    f = curve.base
    batch = u.shape[1:]
    a = fp.const_array(f, curve.a_int, ())
    b = fp.const_array(f, curve.b_int, ())
    z = fp.const_array(f, zeta, ())

    u2 = fp.mont_sqr(f, u)
    zu2 = fp.mont_mul(f, z, u2)          # Z u²
    zu2_sq = fp.mont_sqr(f, zu2)          # Z² u⁴
    den = fp.add(f, zu2_sq, zu2)          # Z²u⁴ + Zu²
    den_zero = fp.is_zero(f, den)
    tv1 = fp.batch_inv(f, den)            # 0 where den == 0
    # x1 = (-b/a)(1 + tv1); exceptional: x1 = b/(Z a)
    neg_b_over_a = fp.mont_mul(f, fp.neg(f, b), fp.inv(f, a))
    x1 = fp.mont_mul(f, neg_b_over_a, fp.add(f, fp.one(f, batch), tv1))
    x1_exc = fp.mont_mul(f, b, fp.inv(f, fp.mont_mul(f, z, a)))
    x1_exc = x1_exc.reshape((x1_exc.shape[0],) + (1,) * len(batch))
    x1 = fp.select(den_zero, jnp.broadcast_to(x1_exc, x1.shape), x1)

    def g(x):
        return fp.add(
            f, fp.add(f, fp.mont_mul(f, fp.mont_sqr(f, x), x), fp.mont_mul(f, a, x)), b
        )

    gx1 = g(x1)
    x2 = fp.mont_mul(f, zu2, x1)
    gx2 = g(x2)
    r1, ok1 = fp.sqrt(f, gx1)
    r2, _ = fp.sqrt(f, gx2)
    x = fp.select(ok1, x1, x2)
    y = fp.select(ok1, r1, r2)
    # match sign: sgn0(y) == sgn0(u) (parity of canonical form; reference
    # curve_maps/mod.rs parity())
    u_par = fp.from_mont(f, u)[0] & 1
    y_par = fp.from_mont(f, y)[0] & 1
    y = fp.select(u_par == y_par, y, fp.neg(f, y))
    return AffinePoints(x, y, jnp.zeros(batch, dtype=bool))
