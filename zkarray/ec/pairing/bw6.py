"""BW6-family pairing engine (batched over the pairs axis).

Reference analog: ec/src/models/bw6/{mod.rs:28-357, g2.rs} — the optimal-ate
pairing for BW6 curves (eprint 2020/351 / El Housni's thesis formulas 4.15 &
4.17): G2 lives over the SAME prime field Fp (sextic twist absorbed into the
field tower), the Miller computation is two ladders (loop 1 over the seed u,
loop 2 over u²-u-1 with f_u reuse), the target field is Fp6 = 2-over-3, and
the hard part of the final exponentiation is the generic Algorithm 4.3 / 4.4
of the thesis (the reference's default BW6Config path; curve crates override
with an equivalent curve-specific addition chain — same output).

TPU shape: both preparation ladders and both Miller loops are lax.scans with
static per-step digit arrays, batched over pairs; per-pair Miller values are
computed independently (mathematically the multi-Miller product) and combined
in a log tree — no shared-f chunking (SURVEY.md §2.7 #6).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.ec.sw import AffinePoints, SWCurveSpec
from zkarray.ff import fp


class BW6Spec:
    def __init__(
        self,
        name: str,
        x: int,
        x_is_neg: bool,
        ate_loop_count_2,  # list of i8 digits of u²-u-1, LSB-first (reference layout)
        loop_2_neg: bool,
        twist_type: str,
        h_t: int,
        h_y: int,
        t_mod_r_is_zero: bool,
        fq_spec,
        fq3,        # ExtOps deg 3
        fq6,        # ExtOps deg 2 over fq3
        g1_curve: SWCurveSpec,
        g2_curve: SWCurveSpec,  # over the SAME Fp (b differs)
        loop_1_neg: bool = False,
    ):
        assert twist_type in ("M", "D")
        self.name = name
        self.x = x
        self.x_is_neg = x_is_neg
        self.x_abs = abs(x)
        self.x_minus_1_div_3 = (abs(x) + 1) // 3 if x_is_neg else (x - 1) // 3
        self.loop_1_bits = [int(b) for b in bin(self.x_abs)[3:]]  # below MSB
        self.loop_1_neg = loop_1_neg
        self.ate_loop_count_2 = tuple(ate_loop_count_2)
        self.loop_2_neg = loop_2_neg
        self.twist_type = twist_type
        self.h_t = h_t
        self.h_y = h_y
        self.t_mod_r_is_zero = t_mod_r_is_zero
        self.fq = fq_spec
        self.fq3 = fq3
        self.fq6 = fq6
        self.g1 = g1_curve
        self.g2 = g2_curve

    def __hash__(self):
        return hash((self.name, self.x))

    def __eq__(self, o):
        return isinstance(o, BW6Spec) and o.name == self.name and o.x == self.x


class G2Prepared(NamedTuple):
    # loop 1 (per-bit): dbl coeffs (n1, 3, L, batch), add coeffs (same)
    dbl_1: jnp.ndarray
    add_1: jnp.ndarray
    extra: jnp.ndarray   # (3, L, batch): l([u]q, q) line
    dbl_2: jnp.ndarray   # (n2, 3, L, batch)
    add_2: jnp.ndarray
    inf: jnp.ndarray


def _double_step(bspec, x, y, z):
    """Homogeneous-projective doubling with line coeffs (eprint 2013/722;
    reference bw6/g2.rs double_in_place) — Fp arithmetic."""
    f = bspec.fq
    a = fp.mont_mul(f, x, y)
    b = fp.mont_sqr(f, y)
    b4 = fp.double(f, fp.double(f, b))
    c = fp.mont_sqr(f, z)
    b_coeff = fp.const_array(f, bspec.g2.b_int, ())
    e = fp.mont_mul(f, b_coeff, fp.add(f, fp.double(f, c), c))
    f3 = fp.add(f, fp.double(f, e), e)
    g = fp.add(f, b, f3)
    h = fp.sub(f, fp.mont_sqr(f, fp.add(f, y, z)), fp.add(f, b, c))
    i_ = fp.sub(f, e, b)
    j = fp.mont_sqr(f, x)
    e2sq = fp.mont_sqr(f, fp.double(f, e))
    xn = fp.mont_mul(f, fp.double(f, a), fp.sub(f, b, f3))
    yn = fp.sub(f, fp.mont_sqr(f, g), fp.add(f, fp.double(f, e2sq), e2sq))
    zn = fp.mont_mul(f, b4, h)
    j3 = fp.add(f, fp.double(f, j), j)
    if bspec.twist_type == "M":
        coeffs = (i_, j3, fp.neg(f, h))
    else:
        coeffs = (fp.neg(f, h), j3, i_)
    return (xn, yn, zn), coeffs


def _add_step(bspec, x, y, z, qx, qy):
    """Homogeneous mixed addition with line coeffs (reference g2.rs
    add_in_place)."""
    f = bspec.fq
    theta = fp.sub(f, y, fp.mont_mul(f, qy, z))
    lam = fp.sub(f, x, fp.mont_mul(f, qx, z))
    c = fp.mont_sqr(f, theta)
    d = fp.mont_sqr(f, lam)
    e = fp.mont_mul(f, lam, d)
    ff = fp.mont_mul(f, z, c)
    g = fp.mont_mul(f, x, d)
    h = fp.sub(f, fp.add(f, e, ff), fp.double(f, g))
    xn = fp.mont_mul(f, lam, h)
    yn = fp.sub(f, fp.mont_mul(f, theta, fp.sub(f, g, h)), fp.mont_mul(f, e, y))
    zn = fp.mont_mul(f, z, e)
    j = fp.sub(f, fp.mont_mul(f, theta, qx), fp.mont_mul(f, lam, qy))
    if bspec.twist_type == "M":
        coeffs = (j, fp.neg(f, theta), lam)
    else:
        coeffs = (lam, fp.neg(f, theta), j)
    return (xn, yn, zn), coeffs


@functools.partial(jax.jit, static_argnums=0)
def g2_prepare(bspec: BW6Spec, Q: AffinePoints) -> G2Prepared:
    """Both ate ladders (reference bw6/g2.rs From<G2Affine>): loop 1 over the
    seed bits collects per-bit double/add coeffs; then the extra line
    l([u]Q, Q); loop 2 over the signed digits of u²-u-1 from ±[u]Q."""
    f = bspec.fq
    batch = Q.x.shape[1:]
    one = fp.one(f, batch)
    bits1 = jnp.asarray(np.asarray(bspec.loop_1_bits, dtype=np.uint32))

    def body1(state, bit):
        x, y, z = state
        (x, y, z), dc = _double_step(bspec, x, y, z)
        (xa, ya, za), ac = _add_step(bspec, x, y, z, Q.x, Q.y)
        take = jnp.broadcast_to(bit == 1, batch)
        x = fp.select(take, xa, x)
        y = fp.select(take, ya, y)
        z = fp.select(take, za, z)
        return (x, y, z), (jnp.stack(dc), jnp.stack(ac))

    (rx, ry, rz), (dbl1, add1) = jax.lax.scan(body1, (Q.x, Q.y, one), bits1)

    # r -> affine [u]Q; sign-swap if loop 1 negative
    zinv = fp.inv(f, rz)
    qux = fp.mont_mul(f, rx, zinv)
    quy = fp.mont_mul(f, ry, zinv)
    if bspec.loop_1_neg:
        quy = fp.neg(f, quy)
    quy_neg = fp.neg(f, quy)

    # extra line l([u]Q, Q) — does NOT advance the ladder (reference clones r)
    _, extra = _add_step(bspec, qux, quy, one, Q.x, Q.y)

    # loop 2 from [u]Q over digits MSB-1 .. 0 of u²-u-1 (digits stored
    # LSB-first in the reference config; iterate high to low skipping MSB)
    digs2 = list(bspec.ate_loop_count_2[:-1])[::-1]
    digits2 = jnp.asarray(np.asarray(digs2, dtype=np.int32))

    def body2(state, dig):
        x, y, z = state
        (x, y, z), dc = _double_step(bspec, x, y, z)
        qy = fp.select(jnp.broadcast_to(dig < 0, batch), quy_neg, quy)
        (xa, ya, za), ac = _add_step(bspec, x, y, z, qux, qy)
        take = jnp.broadcast_to(dig != 0, batch)
        x = fp.select(take, xa, x)
        y = fp.select(take, ya, y)
        z = fp.select(take, za, z)
        return (x, y, z), (jnp.stack(dc), jnp.stack(ac))

    _, (dbl2, add2) = jax.lax.scan(body2, (qux, quy, one), digits2)
    return G2Prepared(dbl1, add1, jnp.stack(extra), dbl2, add2, Q.inf)


def _ell(bspec, F6, fv, coeffs, px, py, active):
    """fv *= line(coeffs)(P) — sparse Fp6(2over3) mul_by_014/034 with PRIME
    field line coefficients (reference bw6/mod.rs ell + fp6_2over3.rs:54-112).
    Realized as two sparse Fp3 embeds: line = (c0·e0 + c1·e1) + c2·e?·w ..."""
    f = bspec.fq
    F3 = bspec.fq3
    c0, c1, c2 = coeffs[0], coeffs[1], coeffs[2]
    batch = px.shape[1:]
    z3 = fp.zero(f, batch)
    if bspec.twist_type == "M":
        # mul_by_014(c0, c1·px, c2·py): sparse element
        #   a = (c0, c1·px, 0) ∈ Fp3, b = (0, c2·py, 0) ∈ Fp3
        a3 = jnp.stack([c0, fp.mont_mul(f, c1, px), z3])
        b3 = jnp.stack([z3, fp.mont_mul(f, c2, py), z3])
    else:
        # mul_by_034(c0·py, c1·px, c2): a = (c0·py, 0, 0), b = (c1·px, c2, 0)
        a3 = jnp.stack([fp.mont_mul(f, c0, py), z3, z3])
        b3 = jnp.stack([fp.mont_mul(f, c1, px), c2, z3])
    line = jnp.stack([a3, b3])
    F6 = bspec.fq6
    nf = F6.mul(fv, line)
    return F6.select(active, nf, fv)


@functools.partial(jax.jit, static_argnums=(0, 3))
def multi_miller_loop(bspec: BW6Spec, P: AffinePoints, Qp: G2Prepared,
                      combine: bool = True):
    """Per-pair batched optimal-ate Miller value f_1·Frob(f_2) (reference
    bw6/mod.rs multi_miller_loop, per-pair formulation)."""
    F6 = bspec.fq6
    batch = P.x.shape[1:]
    active = ~(P.inf | Qp.inf)
    one6 = F6.one(batch)
    bits1 = jnp.asarray(np.asarray(bspec.loop_1_bits, dtype=np.uint32))

    def body1(fv, xs):
        bit, dc, ac = xs
        fv = F6.sqr(fv)
        fv = _ell(bspec, F6, fv, dc, P.x, P.y, active)
        fa = _ell(bspec, F6, fv, ac, P.x, P.y, active)
        return F6.select(jnp.broadcast_to(bit == 1, batch), fa, fv), None

    f_u, _ = jax.lax.scan(body1, one6, (bits1, Qp.dbl_1, Qp.add_1))

    # cyclotomic "inverse" = conjugate; the unitary error lies in Fp3 and is
    # killed by the easy part (reference uses cyclotomic_inverse identically)
    if bspec.loop_1_neg:
        f_u, f_u_inv = F6.conjugate(f_u), f_u
    else:
        f_u_inv = F6.conjugate(f_u)

    # f_1 = f_u · l([u]Q, Q)(P)
    f_1 = _ell(bspec, F6, f_u, Qp.extra, P.x, P.y, active)

    digs2 = list(bspec.ate_loop_count_2[:-1])[::-1]
    digits2 = jnp.asarray(np.asarray(digs2, dtype=np.int32))

    def body2(fv, xs):
        dig, dc, ac = xs
        fv = F6.sqr(fv)
        fv = _ell(bspec, F6, fv, dc, P.x, P.y, active)
        mul_f = F6.select(jnp.broadcast_to(dig < 0, batch), f_u_inv, f_u)
        fm = F6.mul(fv, mul_f)
        fm = _ell(bspec, F6, fm, ac, P.x, P.y, active)
        take = jnp.broadcast_to(dig != 0, batch) & active
        return F6.select(take, fm, fv), None

    f_2, _ = jax.lax.scan(body2, f_u, (digits2, Qp.dbl_2, Qp.add_2))
    if bspec.loop_2_neg:
        f_2 = F6.conjugate(f_2)

    if bspec.t_mod_r_is_zero:
        f_1 = F6.frobenius(f_1, 1)
    else:
        f_2 = F6.frobenius(f_2, 1)
    fv = F6.mul(f_1, f_2)
    fv = F6.select(active, fv, one6)

    if not combine:
        return fv
    n = int(np.prod(batch)) if batch else 1
    fv = fv.reshape(fv.shape[: fv.ndim - len(batch)] + (n,))
    while n > 1:
        h = n // 2
        red = F6.mul(fv[..., :h], fv[..., h : 2 * h])
        if n % 2:
            red = jnp.concatenate([red, fv[..., 2 * h :]], axis=-1)
            n = h + 1
        else:
            n = h
        fv = red
    return fv[..., 0]


# ---------------------------------------------------------------------------
# final exponentiation (reference bw6/mod.rs:226-330: easy part + generic
# Algorithm 4.3/4.4 hard part from El Housni's thesis)
# ---------------------------------------------------------------------------

def _cyc_pow(F6, a, e: int):
    """a^|e|, conjugated if e < 0 (cyclotomic input)."""
    from zkarray.ec.pairing.mnt import ext_pow_const

    r = ext_pow_const(F6, a, abs(e))
    return F6.conjugate(r) if e < 0 else r


def _exp_by_x(bspec, a):
    r = _cyc_pow(bspec.fq6, a, bspec.x_abs)
    return bspec.fq6.conjugate(r) if bspec.x_is_neg else r


def _exp_by_x_plus_1(bspec, a):
    return bspec.fq6.mul(_exp_by_x(bspec, a), a)


def _exp_by_x_minus_1(bspec, a):
    return bspec.fq6.mul(_exp_by_x(bspec, a), bspec.fq6.conjugate(a))


def _exp_by_x_minus_1_div_3(bspec, a):
    r = _cyc_pow(bspec.fq6, a, bspec.x_minus_1_div_3)
    return bspec.fq6.conjugate(r) if bspec.x_is_neg else r


@functools.partial(jax.jit, static_argnums=0)
def final_exponentiation(bspec: BW6Spec, f):
    F6 = bspec.fq6
    # easy part f^((p³-1)(p+1))
    g = F6.mul(F6.conjugate(f), F6.inv(f))
    g = F6.mul(F6.frobenius(g, 1), g)
    m = g

    # hard part
    a = _exp_by_x_minus_1(bspec, m)
    a = _exp_by_x_minus_1(bspec, a)
    d2 = (bspec.h_t * bspec.h_t + 3 * bspec.h_y * bspec.h_y) // 4

    if bspec.t_mod_r_is_zero:
        # Algorithm 4.3
        a = F6.mul(F6.conjugate(F6.mul(m, a)), F6.frobenius(m, 1))
        b = F6.mul(_exp_by_x_plus_1(bspec, a), m)
        a = F6.mul(F6.sqr(a), a)
        a = F6.conjugate(a)
        c = _exp_by_x_minus_1_div_3(bspec, b)
        d = _exp_by_x_minus_1(bspec, c)
        e = F6.mul(_exp_by_x_minus_1(bspec, _exp_by_x_minus_1(bspec, d)), d)
        fe = F6.mul(
            F6.conjugate(F6.mul(_exp_by_x_plus_1(bspec, e), c)), d
        )
        gg = F6.mul(
            F6.mul(F6.conjugate(_exp_by_x_plus_1(bspec, F6.mul(fe, d))), c), b
        )
        d1 = (bspec.h_t - bspec.h_y) // 2
        h = F6.mul(_cyc_pow(F6, fe, d1), e)
        h = F6.mul(F6.mul(F6.mul(F6.sqr(h), h), b), _cyc_pow(F6, gg, d2))
        return F6.mul(a, h)

    # Algorithm 4.4
    a = F6.mul(a, F6.frobenius(m, 1))
    b = F6.mul(_exp_by_x_plus_1(bspec, a), F6.conjugate(m))
    a = F6.mul(F6.sqr(a), a)
    c = _exp_by_x_minus_1_div_3(bspec, b)
    d = _exp_by_x_minus_1(bspec, c)
    e = F6.mul(_exp_by_x_minus_1(bspec, _exp_by_x_minus_1(bspec, d)), d)
    d = F6.conjugate(d)
    fc = F6.mul(d, b)
    gg = F6.mul(_exp_by_x_plus_1(bspec, e), fc)
    h = F6.mul(gg, c)
    i = F6.mul(_exp_by_x_plus_1(bspec, F6.mul(gg, d)), F6.conjugate(fc))
    d1 = (bspec.h_t + bspec.h_y) // 2
    j = F6.mul(_cyc_pow(F6, h, d1), e)
    k = F6.mul(F6.mul(F6.mul(F6.sqr(j), j), b), _cyc_pow(F6, i, d2))
    return F6.mul(a, k)


def pairing(bspec: BW6Spec, P: AffinePoints, Q: AffinePoints):
    """e(P, Q) with batch → product over the batch (multi-pairing)."""
    return final_exponentiation(
        bspec, multi_miller_loop(bspec, P, g2_prepare(bspec, Q))
    )


def pairing_each(bspec: BW6Spec, P: AffinePoints, Q: AffinePoints):
    f = multi_miller_loop(bspec, P, g2_prepare(bspec, Q), False)
    return final_exponentiation(bspec, f)
