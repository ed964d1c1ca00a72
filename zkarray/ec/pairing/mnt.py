"""MNT4/MNT6-family pairing engine (one generic implementation).

Reference analog: ec/src/models/mnt4/{mod.rs:28-240, g2.rs} and
ec/src/models/mnt6/mod.rs — the two families share identical flipped-ate
formulas; only the twist field differs (Fp2 for MNT4, Fp3 for MNT6) and the
target is the quadratic extension of the twist field (Fp4 resp. Fp6-2over3).
This module is generic over the twist-field ExtOps, collapsing the reference's
two near-duplicate modules into one engine.

TPU shape: G2 preparation is a single lax.scan over the signed ate digits
(doubling step always; addition step computed unconditionally and selected by
the digit mask — scan-friendly, uniform work per step), and the Miller loop
is a second scan consuming the stacked coefficient tensors, batched over the
pairs axis (SURVEY.md §2.7 #6).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.ec.sw import AffinePoints, SWCurveSpec
from zkarray.ec.sw_ext import ExtAffine, ExtCurveSpec
from zkarray.ff import fp


class MNTSpec:
    """Family config (reference MNT4Config/MNT6Config assoc. consts)."""

    def __init__(
        self,
        name: str,
        fq_spec,
        fq_tw,           # ExtOps: twist field (Fp2 for MNT4, Fp3 for MNT6)
        fq_target,       # ExtOps: deg-2 over fq_tw (Fp4 / Fp6-2over3)
        g1_curve: SWCurveSpec,
        g2_curve: ExtCurveSpec,
        twist_host,            # TWIST ∈ twist field
        twist_coeff_a_host,    # TWIST_COEFF_A ∈ twist field
        ate_loop_count,        # list of i8 digits, MSB first (incl. leading 1)
        ate_is_loop_count_neg: bool,
        final_exp_last_chunk_1: int,
        final_exp_w0_abs: int,
        final_exp_w0_neg: bool,
    ):
        self.name = name
        self.fq = fq_spec
        self.tw = fq_tw
        self.gt = fq_target
        self.g1 = g1_curve
        self.g2 = g2_curve
        self.twist_host = twist_host
        self.twist_inv_host = fq_tw.host.inv(twist_host)
        self.twist_coeff_a_host = twist_coeff_a_host
        self.ate_loop_count = tuple(ate_loop_count)
        self.ate_is_loop_count_neg = ate_is_loop_count_neg
        self.final_exp_last_chunk_1 = final_exp_last_chunk_1
        self.final_exp_w0_abs = final_exp_w0_abs
        self.final_exp_w0_neg = final_exp_w0_neg

    def __hash__(self):
        return hash((self.name, self.ate_loop_count))

    def __eq__(self, o):
        return isinstance(o, MNTSpec) and o.name == self.name


class G1Prepared(NamedTuple):
    x: jnp.ndarray          # Fp
    y: jnp.ndarray          # Fp
    x_twist: jnp.ndarray    # twist field
    y_twist: jnp.ndarray    # twist field
    inf: jnp.ndarray


class G2Prepared(NamedTuple):
    x_over_twist: jnp.ndarray
    y_over_twist: jnp.ndarray
    dbl_coeffs: jnp.ndarray   # (steps, 4, *twist-shape) c_h,c_4c,c_j,c_l
    add_coeffs: jnp.ndarray   # (steps, 2, *twist-shape) c_l1,c_rz
    final_add: jnp.ndarray    # (2, *twist-shape) — used iff loop count neg
    inf: jnp.ndarray


def g1_prepare(mspec: MNTSpec, P: AffinePoints) -> G1Prepared:
    """x_twist = TWIST·x, y_twist = TWIST·y (reference mnt4/g1.rs From)."""
    F = mspec.tw
    batch = P.x.shape[1:]
    tw = F.const(mspec.twist_host, batch)
    return G1Prepared(
        P.x, P.y, F.mul_base(tw, P.x), F.mul_base(tw, P.y), P.inf
    )


def _double_step(mspec, r):
    """Flipped-miller doubling in extended (x,y,z,t=z²) coords (reference
    mnt4/mod.rs doubling_for_flipped_miller_loop)."""
    F = mspec.tw
    x, y, z, t = r
    batch = F.batch_shape_of(x)
    a = F.sqr(t)
    b = F.sqr(x)
    c = F.sqr(y)
    d = F.sqr(c)
    e = F.sub(F.sub(F.sqr(F.add(x, c)), b), d)
    twa = F.const(mspec.twist_coeff_a_host, batch)
    f3 = F.add(F.add(F.double(b), b), F.mul(twa, a))
    g = F.sqr(f3)
    d8 = F.double(F.double(F.double(d)))
    e4 = F.double(F.double(e))
    xn = F.sub(g, e4)
    yn = F.add(F.neg(d8), F.mul(f3, F.sub(F.double(e), xn)))
    zn = F.sub(F.sub(F.sqr(F.add(y, z)), c), F.sqr(z))
    tn = F.sqr(zn)
    c_h = F.sub(F.sub(F.sqr(F.add(zn, t)), tn), a)
    c_4c = F.double(F.double(c))
    c_j = F.sub(F.sub(F.sqr(F.add(f3, t)), g), a)
    c_l = F.sub(F.sub(F.sqr(F.add(f3, x)), g), b)
    return (xn, yn, zn, tn), (c_h, c_4c, c_j, c_l)


def _add_step(mspec, qx, qy, r):
    """Flipped-miller mixed addition (reference mnt4/mod.rs
    mixed_addition_for_flipped_miller_loop)."""
    F = mspec.tw
    x, y, z, t = r
    a = F.sqr(qy)
    b = F.mul(t, qx)
    d = F.mul(F.sub(F.sub(F.sqr(F.add(z, qy)), a), t), t)
    h = F.sub(b, x)
    i_ = F.sqr(h)
    e = F.double(F.double(i_))
    j = F.mul(h, e)
    v = F.mul(x, e)
    ry2 = F.double(y)
    l1 = F.sub(d, ry2)
    xn = F.sub(F.sub(F.sqr(l1), j), F.double(v))
    yn = F.sub(F.mul(l1, F.sub(v, xn)), F.mul(j, ry2))
    zn = F.sub(F.sub(F.sqr(F.add(z, h)), t), i_)
    tn = F.sqr(zn)
    return (xn, yn, zn, tn), (l1, zn)


@functools.partial(jax.jit, static_argnums=0)
def g2_prepare(mspec: MNTSpec, Q: ExtAffine) -> G2Prepared:
    """Run the ate ladder once, stacking per-digit coefficients
    (reference mnt4/g2.rs From<G2Affine>)."""
    F = mspec.tw
    batch = F.batch_shape_of(Q.x)
    tw_inv = F.const(mspec.twist_inv_host, batch)
    x_ot = F.mul(Q.x, tw_inv)
    y_ot = F.mul(Q.y, tw_inv)
    qy_neg = F.neg(Q.y)

    digits = jnp.asarray(
        np.asarray(mspec.ate_loop_count[1:], dtype=np.int32)
    )
    one = F.one(batch)
    r0 = (Q.x, Q.y, one, one)

    def body(r, dig):
        r, dc = _double_step(mspec, r)
        qy = F.select(jnp.broadcast_to(dig < 0, batch), qy_neg, Q.y)
        ra, ac = _add_step(mspec, Q.x, qy, r)
        take = jnp.broadcast_to(dig != 0, batch)
        r = tuple(F.select(take, a, b) for a, b in zip(ra, r))
        return r, (jnp.stack(dc), jnp.stack(ac))

    r, (dbls, adds) = jax.lax.scan(body, r0, digits)

    if mspec.ate_is_loop_count_neg:
        # -R affine: x/z², -y/z³ then one more addition (reference g2.rs)
        x, y, z, t = r
        zinv = F.inv(z)
        zinv2 = F.sqr(zinv)
        mx = F.mul(x, zinv2)
        my = F.neg(F.mul(y, F.mul(zinv, zinv2)))
        _, fac = _add_step(mspec, mx, my, r)
        final_add = jnp.stack(fac)
    else:
        final_add = jnp.stack((F.zero(batch), F.zero(batch)))
    return G2Prepared(x_ot, y_ot, dbls, adds, final_add, Q.inf)


def _gt_new(mspec, c0, c1):
    return jnp.stack([c0, c1])


@functools.partial(jax.jit, static_argnums=(0, 3))
def multi_miller_loop(mspec: MNTSpec, Pp: G1Prepared, Qp: G2Prepared,
                      combine: bool = True):
    """Batched flipped-ate Miller loop (reference mnt4/mod.rs
    ate_miller_loop); inactive pairs (∞ inputs) contribute 1."""
    F = mspec.tw
    T = mspec.gt
    batch = Pp.x.shape[1:]
    active = ~(Pp.inf | Qp.inf)

    # l1_coeff = embed(px) - x_over_twist; embed via 1·px = (px, 0, ...)
    px_emb = F.mul_base(F.one(batch), Pp.x)
    l1_coeff = F.sub(px_emb, Qp.x_over_twist)
    y_ot_neg = F.neg(Qp.y_over_twist)

    digits = jnp.asarray(np.asarray(mspec.ate_loop_count[1:], dtype=np.int32))
    f0 = T.one(batch)

    def body(f, xs):
        dig, dc, ac = xs
        c_h, c_4c, c_j, c_l = dc[0], dc[1], dc[2], dc[3]
        g_rr = _gt_new(
            mspec,
            F.sub(F.sub(c_l, c_4c), F.mul(c_j, Pp.x_twist)),
            F.mul(c_h, Pp.y_twist),
        )
        f = T.mul(T.sqr(f), T.select(active, g_rr, T.one(batch)))
        c_l1, c_rz = ac[0], ac[1]
        y_sel = F.select(jnp.broadcast_to(dig < 0, batch), y_ot_neg, Qp.y_over_twist)
        g_rq = _gt_new(
            mspec,
            F.mul(c_rz, Pp.y_twist),
            F.neg(F.add(F.mul(y_sel, c_rz), F.mul(l1_coeff, c_l1))),
        )
        take = jnp.broadcast_to(dig != 0, batch) & active
        f = T.select(take, T.mul(f, g_rq), f)
        return f, None

    f, _ = jax.lax.scan(body, f0, (digits, Qp.dbl_coeffs, Qp.add_coeffs))

    if mspec.ate_is_loop_count_neg:
        c_l1, c_rz = Qp.final_add[0], Qp.final_add[1]
        g_rnegr = _gt_new(
            mspec,
            F.mul(c_rz, Pp.y_twist),
            F.neg(F.add(F.mul(Qp.y_over_twist, c_rz), F.mul(l1_coeff, c_l1))),
        )
        f = T.select(active, T.inv(T.mul(f, g_rnegr)), f)

    if not combine:
        return f
    n = int(np.prod(batch)) if batch else 1
    f = f.reshape(f.shape[: f.ndim - len(batch)] + (n,))
    while n > 1:
        h = n // 2
        red = T.mul(f[..., :h], f[..., h : 2 * h])
        if n % 2:
            red = jnp.concatenate([red, f[..., 2 * h :]], axis=-1)
            n = h + 1
        else:
            n = h
        f = red
    return f[..., 0]


def ext_pow_const(ops, a, e: int):
    """a^e by square-and-multiply over any ExtOps (host-constant exponent)."""
    batch = ops.batch_shape_of(a)
    if e == 0:
        return ops.one(batch)
    bits = jnp.asarray(np.asarray([int(b) for b in bin(e)[2:]], dtype=np.uint32))

    def body(r, bit):
        r = ops.sqr(r)
        rm = ops.mul(r, a)
        return ops.select(jnp.broadcast_to(bit == 1, batch), rm, r), None

    r, _ = jax.lax.scan(body, ops.one(batch), bits)
    return r


def _first_chunk(mspec, elt, elt_inv):
    """MNT4: elt^(q²-1); MNT6: elt^((q³-1)(q+1)) (reference
    final_exponentiation_first_chunk). Frobenius^(deg/2) of the quadratic
    target extension is conjugation (cyclotomic inverse)."""
    T = mspec.gt
    t = T.mul(T.conjugate(elt), elt_inv)
    if mspec.tw.deg == 3:
        t = T.mul(T.frobenius(t, 1), t)
    return t


def _last_chunk(mspec, elt, elt_inv):
    T = mspec.gt
    elt_q = T.frobenius(elt, 1)
    w1 = ext_pow_const(T, elt_q, mspec.final_exp_last_chunk_1)
    w0 = ext_pow_const(
        T, elt_inv if mspec.final_exp_w0_neg else elt, mspec.final_exp_w0_abs
    )
    return T.mul(w1, w0)


@functools.partial(jax.jit, static_argnums=0)
def final_exponentiation(mspec: MNTSpec, f):
    T = mspec.gt
    f_inv = T.inv(f)
    a = _first_chunk(mspec, f, f_inv)
    b = _first_chunk(mspec, f_inv, f)
    return _last_chunk(mspec, a, b)


def pairing(mspec: MNTSpec, P: AffinePoints, Q: ExtAffine):
    """e(P, Q) with batch → product over batch (multi-pairing semantics)."""
    f = multi_miller_loop(mspec, g1_prepare(mspec, P), g2_prepare(mspec, Q))
    return final_exponentiation(mspec, f)


def pairing_each(mspec: MNTSpec, P: AffinePoints, Q: ExtAffine):
    f = multi_miller_loop(
        mspec, g1_prepare(mspec, P), g2_prepare(mspec, Q), False
    )
    return final_exponentiation(mspec, f)
