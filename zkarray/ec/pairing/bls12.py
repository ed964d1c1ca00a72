"""BLS12-family pairing engine (batched over the pairs axis).

Reference analog: ec/src/models/bls12/{mod.rs:29-224, g2.rs:16-150}:
X-parameterized Miller loop over G2 line coefficients precomputed by a
doubling/addition ladder in homogeneous projective coordinates
(eprint 2013/722 formulas), sparse Fp12 line multiplication by twist type,
and the eprint 2020/875 final exponentiation (gurvy schedule).

TPU shape: the pairs axis is the batch — every step of the ladder and of the
Miller loop is one batched tower-field op across all pairs (SURVEY.md §2.7
#6); the per-pair partial products combine in a log tree at the end.
Prepared-G2 layout: instead of a variable-length ell_coeffs vec, a dense
(nbits, 3, ...) tensor of doubling-step coeffs plus one of addition-step
coeffs with a static per-bit mask (identical information, scan-friendly).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.ec.sw import AffinePoints
from zkarray.ec.sw_ext import ExtAffine, ExtCurveSpec
from zkarray.ff import cyclotomic as cyc
from zkarray.ff import fp
from zkarray.ff.sparse12 import fp12_mul_by_014, fp12_mul_by_034


class Bls12Spec:
    def __init__(self, name, x: int, twist_type: str, fq_spec, fq2, fq6, fq12,
                 g1_curve, g2_curve: ExtCurveSpec):
        assert twist_type in ("M", "D")
        self.name = name
        self.x = x
        self.x_abs = abs(x)
        self.x_neg = x < 0
        self.twist_type = twist_type
        self.fq = fq_spec
        self.fq2 = fq2
        self.fq6 = fq6
        self.fq12 = fq12
        self.g1 = g1_curve
        self.g2 = g2_curve
        self.two_inv_int = pow(2, -1, fq_spec.modulus)
        # bits of |X| below the leading one, MSB first
        self.x_bits = [int(b) for b in bin(self.x_abs)[3:]]

    def __hash__(self):
        return hash((self.name, self.x))

    def __eq__(self, o):
        return isinstance(o, Bls12Spec) and o.name == self.name and o.x == self.x


class G2Prepared(NamedTuple):
    dbl_coeffs: Tuple  # (nbits, 3-tuple of Fp2 arrays) stacked: (nbits, 3, 2, L, *batch)
    add_coeffs: Tuple
    inf: jnp.ndarray  # (batch,) bool


def _double_step(bspec, x, y, z):
    """One ladder doubling; returns new (x,y,z) and line coeffs (c0,c1,c2).

    eprint 2013/722 homogeneous-projective formulas (reference g2.rs
    double_in_place)."""
    F2 = bspec.fq2
    Fq = F2.base  # prime ops
    half = fp.const_array(bspec.fq, bspec.two_inv_int, ())
    a = F2.mul_base(F2.mul(x, y), half)
    b = F2.sqr(y)
    c = F2.sqr(z)
    b_twist = F2.const(bspec.g2.b_host, F2.batch_shape_of(x))
    e = F2.mul(b_twist, F2.add(F2.double(c), c))
    f3 = F2.add(F2.double(e), e)
    g = F2.mul_base(F2.add(b, f3), half)
    h = F2.sub(F2.sqr(F2.add(y, z)), F2.add(b, c))
    i_ = F2.sub(e, b)
    j = F2.sqr(x)
    e2 = F2.sqr(e)
    xn = F2.mul(a, F2.sub(b, f3))
    yn = F2.sub(F2.sqr(g), F2.add(F2.double(e2), e2))
    zn = F2.mul(b, h)
    j3 = F2.add(F2.double(j), j)
    if bspec.twist_type == "M":
        coeffs = (i_, j3, F2.neg(h))
    else:
        coeffs = (F2.neg(h), j3, i_)
    return (xn, yn, zn), coeffs


def _add_step(bspec, x, y, z, qx, qy):
    """Ladder mixed addition with line coeffs (reference g2.rs add_in_place)."""
    F2 = bspec.fq2
    theta = F2.sub(y, F2.mul(qy, z))
    lam = F2.sub(x, F2.mul(qx, z))
    c = F2.sqr(theta)
    d = F2.sqr(lam)
    e = F2.mul(lam, d)
    f = F2.mul(z, c)
    g = F2.mul(x, d)
    h = F2.sub(F2.add(e, f), F2.double(g))
    xn = F2.mul(lam, h)
    yn = F2.sub(F2.mul(theta, F2.sub(g, h)), F2.mul(e, y))
    zn = F2.mul(z, e)
    j = F2.sub(F2.mul(theta, qx), F2.mul(lam, qy))
    if bspec.twist_type == "M":
        coeffs = (j, F2.neg(theta), lam)
    else:
        coeffs = (lam, F2.neg(theta), j)
    return (xn, yn, zn), coeffs


@functools.partial(jax.jit, static_argnums=0)
def g2_prepare(bspec: Bls12Spec, Q: ExtAffine) -> G2Prepared:
    """Run the |X| ladder once, collecting line coefficients per bit
    (one lax.scan; the doubling- and addition-step coeff tensors get a
    leading nbits axis consumed by the Miller scan).
    """
    F2 = bspec.fq2
    batch = F2.batch_shape_of(Q.x)
    state0 = (Q.x, Q.y, F2.one(batch))
    bits = jnp.asarray(np.asarray(bspec.x_bits, dtype=np.uint32))

    def body(state, bit):
        x, y, z = state
        (x, y, z), dc = _double_step(bspec, x, y, z)
        (xa, ya, za), ac = _add_step(bspec, x, y, z, Q.x, Q.y)
        take = jnp.broadcast_to(bit == 1, batch)
        x = F2.select(take, xa, x)
        y = F2.select(take, ya, y)
        z = F2.select(take, za, z)
        return (x, y, z), (jnp.stack(dc), jnp.stack(ac))

    _, (dbls, adds) = jax.lax.scan(body, state0, bits)
    return G2Prepared(dbls, adds, Q.inf)


def _ell(bspec, f, coeffs, px, py, active):
    """f *= line(coeffs) evaluated at p; masked by ``active``.

    Reference: Bls12::ell (bls12/mod.rs:174-192)."""
    F12 = bspec.fq12
    F2 = bspec.fq2
    c0, c1, c2 = coeffs[0], coeffs[1], coeffs[2]
    if bspec.twist_type == "M":
        c2 = F2.mul_base(c2, py)
        c1 = F2.mul_base(c1, px)
        nf = fp12_mul_by_014(F12, f, c0, c1, c2)
    else:
        c0 = F2.mul_base(c0, py)
        c1 = F2.mul_base(c1, px)
        nf = fp12_mul_by_034(F12, f, c0, c1, c2)
    return F12.select(active, nf, f)


@functools.partial(jax.jit, static_argnums=(0, 3))
def multi_miller_loop(bspec: Bls12Spec, P: AffinePoints, Qp: G2Prepared,
                      combine: bool = True):
    """Batched Miller loop over the pairs axis; returns the Fp12 product
    over all pairs (pairs where either input is ∞ contribute 1), or the
    per-pair values when combine=False."""
    F12 = bspec.fq12
    batch = P.x.shape[1:]
    active = ~(P.inf | Qp.inf)
    f = F12.one(batch)
    bits = jnp.asarray(np.asarray(bspec.x_bits, dtype=np.uint32))

    def body(f, xs):
        bit, dc, ac = xs
        f = F12.sqr(f)
        f = _ell(bspec, f, dc, P.x, P.y, active)
        f_add = _ell(bspec, f, ac, P.x, P.y, active)
        return F12.select(jnp.broadcast_to(bit == 1, batch), f_add, f), None

    f, _ = jax.lax.scan(body, f, (bits, Qp.dbl_coeffs, Qp.add_coeffs))
    if bspec.x_neg:
        f = F12.conjugate(f)
    if not combine:
        return f
    # product over the pairs axis (log tree)
    n = int(np.prod(batch)) if batch else 1
    f = f.reshape(f.shape[: f.ndim - len(batch)] + (n,))
    while n > 1:
        h = n // 2
        lo = f[..., :h]
        hi = f[..., h : 2 * h]
        red = F12.mul(lo, hi)
        if n % 2:
            red = jnp.concatenate([red, f[..., 2 * h :]], axis=-1)
            n = h + 1
        else:
            n = h
        f = red
    return f[..., 0]


# ---------------------------------------------------------------------------
# final exponentiation (eprint 2020/875, gurvy schedule — reference
# bls12/mod.rs:89-157)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def _cyclotomic_exp_x(bspec, f):
    """f^|X| with Granger–Scott cyclotomic squarings (input is in the
    cyclotomic subgroup after the easy part), then conjugate if X < 0
    (reference exp_by_x + CyclotomicMultSubgroup::cyclotomic_exp).

    Jitted ON ITS OWN: final_exponentiation calls it five times, and as one
    inlined graph XLA:CPU hits its 'Very slow compile' path (measured
    round 4: the whole-final-exp graph was the single largest compile in
    the test suite). Split out, the |X|-scan compiles once and is reused.
    """
    F12 = bspec.fq12
    r = cyc.cyclotomic_exp_binary(F12, f, bspec.x_abs)
    return F12.conjugate(r) if bspec.x_neg else r


@functools.partial(jax.jit, static_argnums=0)
def _fe_easy(bspec: Bls12Spec, f):
    """Easy part f^((p^6-1)(p^2+1)) — contains the one Fp12 inversion."""
    F12 = bspec.fq12
    f1 = F12.conjugate(f)          # f^(p^6)
    f2 = F12.inv(f)                # f^(-1)
    r = F12.mul(f1, f2)            # f^(p^6 - 1)
    f2 = r
    r = F12.frobenius(r, 2)
    return F12.mul(r, f2)          # f^((p^6-1)(p^2+1))


@functools.partial(jax.jit, static_argnums=0)
def _fe_hard_glue(bspec: Bls12Spec, r, y1a, y2b, y2c, y2e):
    """The non-exp_by_x steps of the gurvy hard part, given the exp_by_x
    results it consumes (y2d only feeds y2e = y2d^x, computed by the
    caller; see final_exponentiation for the wiring)."""
    F12 = bspec.fq12
    y0 = cyc.cyclotomic_sqr(F12, r)
    y1 = F12.mul(y1a, F12.conjugate(r))
    y1 = F12.mul(F12.conjugate(y1), y2b)
    y1f = F12.frobenius(y1, 1)
    y1n = F12.mul(y1f, y2c)
    r = F12.mul(r, y0)
    y0 = F12.frobenius(y1n, 2)
    y1c = F12.conjugate(y1n)
    y1x = F12.mul(y1c, y2e)
    y1x = F12.mul(y1x, y0)
    return F12.mul(r, y1x)


def final_exponentiation(bspec: Bls12Spec, f):
    """eprint 2020/875 (gurvy schedule), reference bls12/mod.rs:89-157.

    Deliberately NOT one jit: the five f^|X| scans share ONE compiled
    _cyclotomic_exp_x; the remaining ~12 tower ops are two small jits.
    The interleaving below reproduces the original schedule exactly:
    y1a = r^x; y2b = (y1a·r̄)^x; y2c = (conj(y1a·r̄)·y2b)^x; then with
    y1n = frob(·)·y2c: y2d = y1n^x, y2e = y2d^x.
    """
    F12 = bspec.fq12
    r = _fe_easy(bspec, f)
    y1a = _cyclotomic_exp_x(bspec, r)
    y1_mid = F12.mul(y1a, F12.conjugate(r))
    y2b = _cyclotomic_exp_x(bspec, y1_mid)
    y1_mid2 = F12.mul(F12.conjugate(y1_mid), y2b)
    y2c = _cyclotomic_exp_x(bspec, y1_mid2)
    y1n = F12.mul(F12.frobenius(y1_mid2, 1), y2c)
    y2d = _cyclotomic_exp_x(bspec, y1n)
    y2e = _cyclotomic_exp_x(bspec, y2d)
    return _fe_hard_glue(bspec, r, y1a, y2b, y2c, y2e)


def pairing(bspec: Bls12Spec, P: AffinePoints, Q: ExtAffine):
    """Full pairing e(P, Q) (batched → product over the batch axis, matching
    the reference's multi_pairing; pass batch-1 inputs for one pairing)."""
    return final_exponentiation(bspec, multi_miller_loop(bspec, P, g2_prepare(bspec, Q)))


def pairing_each(bspec: Bls12Spec, P: AffinePoints, Q: ExtAffine):
    """Per-pair pairings e(P_i, Q_i) (no cross-pair product)."""
    f = multi_miller_loop(bspec, P, g2_prepare(bspec, Q), False)
    return final_exponentiation(bspec, f)


def fp12_pow_const(fq12, a, e: int):
    """Generic (non-cyclotomic) Fp12 pow for tests."""
    batch = fq12.batch_shape_of(a)
    if e == 0:
        return fq12.one(batch)
    bits = jnp.asarray(np.asarray([int(b) for b in bin(e)[2:]], dtype=np.uint32))

    def body(r, bit):
        r = fq12.sqr(r)
        rm = fq12.mul(r, a)
        return fq12.select(jnp.broadcast_to(bit == 1, batch), rm, r), None

    r, _ = jax.lax.scan(body, fq12.one(batch), bits)
    return r
