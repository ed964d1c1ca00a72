"""Simplified SWU map-to-curve over a quadratic extension field (RFC 9380
§6.6.2 with the §4.1 m=2 sgn0), batched.

Reference analog: the same generic swu.rs:15-70 machinery the G1 map uses,
instantiated at Fq2 (curves/bls12_381/src/curves/g2_swu_iso.rs). All
branches are computed and mask-selected; the square root is the norm-trick
quad_sqrt (two base-field sqrts) instead of Tonelli–Shanks in Fq2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zkarray.ff import fp
from zkarray.ff.towers import ExtOps, quad_sqrt


def sgn0_m2(F2: ExtOps, e: jnp.ndarray) -> jnp.ndarray:
    """RFC 9380 §4.1 sgn0 for m = 2: sign of the first nonzero component's
    canonical parity (reference curve_maps/mod.rs parity via sgn0)."""
    spec = F2.spec
    c0 = fp.from_mont(spec, e[0])
    c1 = fp.from_mont(spec, e[1])
    d0 = c0[0] & 1
    z0 = fp.is_zero(spec, e[0])
    d1 = c1[0] & 1
    return jnp.where(z0, d1, d0)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6))
def swu_map_ext(
    F2: ExtOps,
    u: jnp.ndarray,
    a_host: tuple,
    b_host: tuple,
    zeta_host: tuple,
    neg_b_over_a_host: tuple,
    b_over_za_host: tuple,
) -> tuple:
    """u (2, L, n) Fq2 elements -> (x, y) on E': y² = x³ + a x + b (never
    infinity). The -b/a and b/(Z·a) constants are host-precomputed."""
    batch = F2.batch_shape_of(u)
    a = F2.const(a_host, ())
    b = F2.const(b_host, ())
    z = F2.const(zeta_host, ())

    u2 = F2.sqr(u)
    zu2 = F2.mul(z, u2)  # Z u²
    den = F2.add(F2.sqr(zu2), zu2)  # Z²u⁴ + Zu²
    den_zero = F2.is_zero(den)
    tv1 = F2.inv(den)  # inv(0) = 0 where den == 0
    x1 = F2.mul(
        F2.const(neg_b_over_a_host, ()), F2.add(F2.one(batch), tv1)
    )
    x1 = F2.select(den_zero, F2.const(b_over_za_host, batch), x1)

    def g(x):
        return F2.add(F2.add(F2.mul(F2.sqr(x), x), F2.mul(a, x)), b)

    gx1 = g(x1)
    x2 = F2.mul(zu2, x1)
    gx2 = g(x2)
    r1, ok1 = quad_sqrt(F2, gx1)
    r2, _ = quad_sqrt(F2, gx2)
    x = F2.select(ok1, x1, x2)
    y = F2.select(ok1, r1, r2)
    # sgn0(y) == sgn0(u)
    y = F2.select(sgn0_m2(F2, u) == sgn0_m2(F2, y), y, F2.neg(y))
    return x, y
