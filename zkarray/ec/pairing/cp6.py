"""CP6-782 pairing engine (the Zexe outer curve over BLS12-377).

Reference analog: curves/cp6_782/src/curves/mod.rs:27-187 — an ate Miller
loop in AFFINE G2 coordinates (one inversion per step, mod.rs:83,103) and a
two-chunk final exponentiation (frobenius-3 easy part + W1/W0 cyclotomic
powers).

TPU shape: every quantity in the ladder depends only on Q, so the whole
affine ladder — inversions included — runs ONCE at preparation time on the
host (cheap Python bigints), exactly the role of the reference's
G2Prepared precompute in the other families (bls12/g2.rs:45-70). What ships
to the device is a dense (steps, ...) tensor of line coefficients; the
Miller loop is a lax.scan of Fq6 square + line multiplications batched over
the pairs axis, and the final exponentiation reuses the generic cyclotomic
ladder (conjugate-inverse on the quadratic-topped Fq6).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.ec.sw import AffinePoints, SWCurveSpec
from zkarray.ec.sw_ext import ExtAffine, ExtCurveSpec
from zkarray.ff import cyclotomic as cyc
from zkarray.ff import fp


class CP6Spec:
    def __init__(self, name, fq_spec, fq3, fq6, g1_curve: SWCurveSpec,
                 g2_curve: ExtCurveSpec, twist_host, ate_loop_count: int,
                 w0_abs: int, w0_neg: bool, w1: int):
        self.name = name
        self.fq = fq_spec
        self.fq3 = fq3
        self.fq6 = fq6
        self.g1 = g1_curve
        self.g2 = g2_curve
        self.twist_host = twist_host
        self.ate_loop_count = ate_loop_count
        self.w0_abs = w0_abs
        self.w0_neg = w0_neg
        self.w1 = w1

    def __hash__(self):
        return hash((self.name, self.ate_loop_count))

    def __eq__(self, o):
        return isinstance(o, CP6Spec) and o.name == self.name


class CP6G2Prepared(NamedTuple):
    """Host-precomputed line data. Layouts (steps, 3, L, n) per Fq3 coeff."""
    dbl_gro: jnp.ndarray   # γ·old_rx − old_ry  per doubling step
    dbl_gt: jnp.ndarray    # γ·TWIST            per doubling step
    add_gro: jnp.ndarray   # γ'·qx − qy         per (masked) addition step
    add_gt: jnp.ndarray    # γ'·TWIST
    bits: jnp.ndarray      # (steps,) bool — addition mask
    inf: jnp.ndarray


def g2_prepare_host(spec: CP6Spec, q_list) -> CP6G2Prepared:
    """Prepare a batch of G2 points given as [(x3, y3)] nested int tuples.

    Mirrors the reference ladder (cp6_782/src/curves/mod.rs:68-117) on host
    integers; the per-step inverses are host modular inverses.
    """
    H = spec.fq3.host
    tw = spec.twist_host
    steps_bits = [int(b) for b in bin(spec.ate_loop_count)[3:]]  # skip MSB
    per_point = []
    for (qx, qy) in q_list:
        rx, ry = qx, qy
        rows = []
        for bit in steps_bits:
            # doubling line
            gamma = H.mul(
                H.add(H.mul(H.embed(3), H.mul(rx, rx)),
                      spec.g2.a_host if isinstance(spec.g2.a_host, tuple)
                      else H.embed(spec.g2.a_host)),
                H.inv(H.add(ry, ry)),
            )
            gro = H.sub(H.mul(gamma, rx), ry)
            gt = H.mul(gamma, tw)
            nrx = H.sub(H.mul(gamma, gamma), H.add(rx, rx))
            nry = H.sub(H.mul(gamma, H.sub(rx, nrx)), ry)
            rx, ry = nrx, nry
            if bit:
                gamma2 = H.mul(H.sub(ry, qy), H.inv(H.sub(rx, qx)))
                gro2 = H.sub(H.mul(gamma2, qx), qy)
                gt2 = H.mul(gamma2, tw)
                nrx = H.sub(H.sub(H.mul(gamma2, gamma2), rx), qx)
                nry = H.sub(H.mul(gamma2, H.sub(rx, nrx)), ry)
                rx, ry = nrx, nry
            else:
                gro2, gt2 = H.zero(), H.zero()
            rows.append((gro, gt, gro2, gt2))
        per_point.append(rows)

    F3 = spec.fq3

    def stack(sel):
        # -> (steps, 3, L, n) device tensor
        cols = []
        for rows in per_point:
            step_arr = [F3.from_ints([[c] for c in F3.host.flatten(r[sel])])
                        for r in rows]
            cols.append(jnp.stack(step_arr))
        return jnp.concatenate(cols, axis=-1)

    n = len(q_list)
    return CP6G2Prepared(
        stack(0), stack(1), stack(2), stack(3),
        jnp.asarray(np.asarray(steps_bits, dtype=bool)),
        jnp.zeros((n,), dtype=bool),
    )


@functools.partial(jax.jit, static_argnums=(0, 3))
def multi_miller_loop(spec: CP6Spec, P: AffinePoints, Qp: CP6G2Prepared,
                      combine: bool = True):
    """Reference ate_miller_loop (mod.rs:57-119), batched over pairs."""
    F3, F6 = spec.fq3, spec.fq6
    batch = P.x.shape[1:]
    active = ~(P.inf | Qp.inf)

    # py·TWIST²: TWIST = (0,1,0) so TWIST² = (0,0,1) → (0, 0, py)
    z3 = fp.zero(spec.fq, batch)
    py_t2 = jnp.stack([z3, z3, P.y])  # Fq3 with base-field rows

    def line_mul(f, gro, gt, take):
        # ell = Fq6(x = py_t2, y = gro − gt·px)
        y = F3.sub(gro, F3.mul_base(gt, P.x))
        ell = F6._stack([py_t2, y])
        fm = F6.mul(f, ell)
        return F6.select(jnp.broadcast_to(take, batch), fm, f)

    def body(f, xs):
        bit, gro, gt, gro2, gt2 = xs
        f = F6.sqr(f)
        f = line_mul(f, gro, gt, active)
        f = line_mul(f, gro2, gt2, active & jnp.broadcast_to(bit, batch))
        return f, None

    f0 = F6.one(batch)
    f, _ = jax.lax.scan(
        body, f0, (Qp.bits, Qp.dbl_gro, Qp.dbl_gt, Qp.add_gro, Qp.add_gt)
    )
    if not combine:
        return f
    n = int(np.prod(batch)) if batch else 1
    f = f.reshape(f.shape[: f.ndim - len(batch)] + (n,))
    while n > 1:
        h = n // 2
        red = F6.mul(f[..., :h], f[..., h : 2 * h])
        if n % 2:
            red = jnp.concatenate([red, f[..., 2 * h :]], axis=-1)
            n = h + 1
        else:
            n = h
        f = red
    return f[..., 0]


@functools.partial(jax.jit, static_argnums=0)
def final_exponentiation(spec: CP6Spec, f):
    """Reference final_exponentiation (mod.rs:121-155)."""
    F6 = spec.fq6

    def first(elt, elt_inv):
        e_q3 = F6.frobenius(elt, 3)
        over = F6.mul(e_q3, elt_inv)
        return F6.mul(F6.frobenius(over, 1), over)

    f_inv = F6.inv(f)
    vt = first(f, f_inv)
    vit = first(f_inv, f)
    # last chunk: frob(elt)^W1 · (elt or elt_inv)^W0
    e_q = F6.frobenius(vt, 1)
    w1_part = cyc.cyclotomic_exp_binary(F6, e_q, spec.w1)
    base = vit if spec.w0_neg else vt
    w0_part = cyc.cyclotomic_exp_binary(F6, base, spec.w0_abs)
    return F6.mul(w1_part, w0_part)


def pairing_each(spec: CP6Spec, P: AffinePoints, q_list):
    """Per-pair pairings; ``q_list`` are host int tuples (prepare is a host
    step for this family — see module docstring)."""
    Qp = g2_prepare_host(spec, q_list)
    return final_exponentiation(spec, multi_miller_loop(spec, P, Qp, False))
