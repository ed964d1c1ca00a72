"""BN-family pairing engine (BN254), batched over the pairs axis.

Reference analog: ec/src/models/bn/{mod.rs:27-210, g2.rs}: ate loop over
signed digits of |6X+2| (the same homogeneous-projective doubling/addition
ladder as BLS12), followed by two Frobenius-twist correction additions
(q1 = π(Q), q2 = -π²(Q)), and the Fuentes-Castañeda final exponentiation.

Reuses the BLS12 ladder step/ell helpers (the formulas are family-shared in
the reference too).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.ec.pairing import bls12 as _b
from zkarray.ec.sw import AffinePoints
from zkarray.ff import cyclotomic as cyc
from zkarray.ec.sw_ext import ExtAffine, ExtCurveSpec


class BnSpec:
    def __init__(self, name, x: int, ate_loop_count, twist_type, fq_spec, fq2,
                 fq6, fq12, g1_curve, g2_curve: ExtCurveSpec,
                 twist_mul_by_q_x, twist_mul_by_q_y):
        assert twist_type in ("M", "D")
        self.name = name
        self.x = x
        self.x_abs = abs(x)
        self.x_neg = x < 0
        self.ate_loop_count = list(ate_loop_count)  # arkworks digit order
        self.twist_type = twist_type
        self.fq = fq_spec
        self.fq2 = fq2
        self.fq6 = fq6
        self.fq12 = fq12
        self.g1 = g1_curve
        self.g2 = g2_curve
        self.twist_mul_by_q_x = twist_mul_by_q_x  # host Fq2 elems
        self.twist_mul_by_q_y = twist_mul_by_q_y
        self.two_inv_int = pow(2, -1, fq_spec.modulus)
        # iteration digits, in execution order: i = len-1 .. 1, digit ATE[i-1]
        self.digits = [self.ate_loop_count[i - 1] for i in range(len(self.ate_loop_count) - 1, 0, -1)]

    def __hash__(self):
        return hash((self.name, self.x))

    def __eq__(self, o):
        return isinstance(o, BnSpec) and o.name == self.name and o.x == self.x


class BnG2Prepared(NamedTuple):
    dbl_coeffs: jnp.ndarray  # (steps, 3, 2, L, *batch)
    add_coeffs: jnp.ndarray
    q1_coeffs: jnp.ndarray  # (3, 2, L, *batch)
    q2_coeffs: jnp.ndarray
    inf: jnp.ndarray


def _mul_by_char(bspec: BnSpec, Q: ExtAffine) -> ExtAffine:
    """π(Q): coordinate-wise Frobenius times the twist constants
    (reference bn/g2.rs mul_by_char)."""
    F2 = bspec.fq2
    batch = F2.batch_shape_of(Q.x)
    x = F2.mul(F2.frobenius(Q.x, 1), F2.const(bspec.twist_mul_by_q_x, batch))
    y = F2.mul(F2.frobenius(Q.y, 1), F2.const(bspec.twist_mul_by_q_y, batch))
    return ExtAffine(x, y, Q.inf)


@functools.partial(jax.jit, static_argnums=0)
def g2_prepare(bspec: BnSpec, Q: ExtAffine) -> BnG2Prepared:
    F2 = bspec.fq2
    batch = F2.batch_shape_of(Q.x)
    Qneg = ExtAffine(Q.x, F2.neg(Q.y), Q.inf)
    state0 = (Q.x, Q.y, F2.one(batch))
    digs = jnp.asarray(np.asarray(bspec.digits, dtype=np.int32))

    def body(state, d):
        x, y, z = state
        (x, y, z), dc = _b._double_step(bspec, x, y, z)
        qx = F2.select(jnp.broadcast_to(d < 0, batch), Qneg.x, Q.x)
        qy = F2.select(jnp.broadcast_to(d < 0, batch), Qneg.y, Q.y)
        (xa, ya, za), ac = _b._add_step(bspec, x, y, z, qx, qy)
        take = jnp.broadcast_to(d != 0, batch)
        x = F2.select(take, xa, x)
        y = F2.select(take, ya, y)
        z = F2.select(take, za, z)
        return (x, y, z), (jnp.stack(dc), jnp.stack(ac))

    (x, y, z), (dbls, adds) = jax.lax.scan(body, state0, digs)
    if bspec.x_neg:
        y = F2.neg(y)
    q1 = _mul_by_char(bspec, Q)
    q2 = _mul_by_char(bspec, q1)
    q2 = ExtAffine(q2.x, F2.neg(q2.y), q2.inf)
    (x, y, z), c1 = _b._add_step(bspec, x, y, z, q1.x, q1.y)
    (x, y, z), c2 = _b._add_step(bspec, x, y, z, q2.x, q2.y)
    return BnG2Prepared(dbls, adds, jnp.stack(c1), jnp.stack(c2), Q.inf)


@functools.partial(jax.jit, static_argnums=(0, 3))
def multi_miller_loop(bspec: BnSpec, P: AffinePoints, Qp: BnG2Prepared,
                      combine: bool = True):
    F12 = bspec.fq12
    batch = P.x.shape[1:]
    active = ~(P.inf | Qp.inf)
    digs = jnp.asarray(np.asarray(bspec.digits, dtype=np.int32))
    f = F12.one(batch)

    def body(f, xs):
        d, dc, ac = xs
        f = F12.sqr(f)  # first iteration squares 1 — no-op, matches ref skip
        f = _b._ell(bspec, f, dc, P.x, P.y, active)
        f_add = _b._ell(bspec, f, ac, P.x, P.y, active)
        return F12.select(jnp.broadcast_to(d != 0, batch), f_add, f), None

    f, _ = jax.lax.scan(body, f, (digs, Qp.dbl_coeffs, Qp.add_coeffs))
    if bspec.x_neg:
        f = F12.conjugate(f)
    f = _b._ell(bspec, f, Qp.q1_coeffs, P.x, P.y, active)
    f = _b._ell(bspec, f, Qp.q2_coeffs, P.x, P.y, active)
    if not combine:
        return f
    n = int(np.prod(batch)) if batch else 1
    f = f.reshape(f.shape[: f.ndim - len(batch)] + (n,))
    while n > 1:
        h = n // 2
        red = F12.mul(f[..., :h], f[..., h : 2 * h])
        if n % 2:
            red = jnp.concatenate([red, f[..., 2 * h :]], axis=-1)
            n = h + 1
        else:
            n = h
        f = red
    return f[..., 0]


@functools.partial(jax.jit, static_argnums=0)
def _exp_by_neg_x(bspec: BnSpec, f):
    """f^{-X} with Granger–Scott cyclotomic squarings (reference
    Bn::exp_by_neg_x via CyclotomicMultSubgroup). Jitted on its own so the
    three call sites share ONE compiled |X|-scan instead of inlining three
    copies into the final-exp graph (XLA:CPU 'Very slow compile' otherwise —
    same split as bls12._cyclotomic_exp_x)."""
    F12 = bspec.fq12
    r = cyc.cyclotomic_exp_binary(F12, f, bspec.x_abs)
    return r if bspec.x_neg else F12.conjugate(r)


@functools.partial(jax.jit, static_argnums=0)
def _fe_easy(bspec: BnSpec, f):
    F12 = bspec.fq12
    f1 = F12.conjugate(f)
    f2 = F12.inv(f)
    r = F12.mul(f1, f2)
    f2 = r
    r = F12.frobenius(r, 2)
    return F12.mul(r, f2)


@functools.partial(jax.jit, static_argnums=0)
def _fe_prep1(bspec: BnSpec, y0):
    """y3 = y2·y1 with y1 = y0², y2 = y1² (between the first two exp_x)."""
    F12 = bspec.fq12
    y1 = cyc.cyclotomic_sqr(F12, y0)
    y2 = cyc.cyclotomic_sqr(F12, y1)
    return F12.mul(y2, y1), y1


def _fe_hard_glue(bspec: BnSpec, r, y1, y3, y4, y6):
    """Deliberately NOT one jit: XLA:CPU deterministically segfaults
    serializing this executable for the persistent compilation cache
    (measured round 4, jax 0.9: `executable.serialize()` crash in
    compilation_cache.put_executable_and_time — BN254 glue only; the
    BLS12-381 twin is fine). Eagerly dispatched tower ops sidestep it at
    ~ms cost on a once-per-pairing tail."""
    F12 = bspec.fq12
    y3 = F12.conjugate(y3)
    y6 = F12.conjugate(y6)
    y7 = F12.mul(y6, y4)
    y8 = F12.mul(y7, y3)
    y9 = F12.mul(y8, y1)
    y10 = F12.mul(y8, y4)
    y11 = F12.mul(y10, r)
    y12 = F12.frobenius(y9, 1)
    y13 = F12.mul(y12, y11)
    y8f = F12.frobenius(y8, 2)
    y14 = F12.mul(y8f, y13)
    rc = F12.conjugate(r)
    y15 = F12.mul(rc, y9)
    y15 = F12.frobenius(y15, 3)
    y16 = F12.mul(y15, y14)
    return y16


def final_exponentiation(bspec: BnSpec, f):
    """Easy part + Fuentes-Castañeda hard part (reference bn/mod.rs:107-166).
    Split into small jits sharing one compiled exp_by_neg_x (see above)."""
    F12 = bspec.fq12
    r = _fe_easy(bspec, f)
    y0 = _exp_by_neg_x(bspec, r)
    y3, y1 = _fe_prep1(bspec, y0)
    y4 = _exp_by_neg_x(bspec, y3)
    y5 = cyc.cyclotomic_sqr(F12, y4)
    y6 = _exp_by_neg_x(bspec, y5)
    return _fe_hard_glue(bspec, r, y1, y3, y4, y6)


def pairing(bspec: BnSpec, P: AffinePoints, Q: ExtAffine):
    return final_exponentiation(bspec, multi_miller_loop(bspec, P, g2_prepare(bspec, Q)))


def pairing_each(bspec: BnSpec, P: AffinePoints, Q: ExtAffine):
    return final_exponentiation(
        bspec, multi_miller_loop(bspec, P, g2_prepare(bspec, Q), False)
    )
