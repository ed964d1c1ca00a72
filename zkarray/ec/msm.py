"""Variable-base multi-scalar multiplication (Pippenger), TPU-shaped.

Reference analog: ark-ec's VariableBaseMSM signed-digit wNAF Pippenger
(ec/src/scalar_mul/variable_base/mod.rs:242-793): window digits recentered to
[-2^(c-1), 2^(c-1)) (make_digits :754-793), per-window bucket accumulation in
XYZZ coordinates, bucket suffix sums, Horner window combine.

TPU design (SURVEY.md §2.7 #3): instead of rayon threads, a lane grid of
K = W·G lanes (W windows × G point-groups). Each lane owns a private bucket
array; one lax.scan step gathers each lane's target bucket, performs a
batched XYZZ mixed add across all K lanes, and scatters back. Total work is
the Pippenger optimum W·N mixed adds; serial depth is N/G scan steps. Bucket
arrays then reduce across G (log tree), suffix-scan across buckets
(associative_scan), and Horner-combine across windows.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.core import limbs as lb
from zkarray.ec import sw
from zkarray.ec.sw import AffinePoints, JacobianPoints, SWCurveSpec, XYZZPoints
from zkarray.ff import fp


def default_window_size(n: int) -> int:
    """Reference heuristic: ln(n) + 2 (ec/src/scalar_mul/mod.rs:22-25)."""
    if n < 32:
        return 3
    return min(16, int(math.log2(n) * 69 / 100) + 2)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def signed_digits(spec, scalars: jnp.ndarray, c: int, num_windows: int) -> jnp.ndarray:
    """Scalar limbs (canonical) -> signed window digits (W, N) int32 in
    [-2^(c-1), 2^(c-1)). Reference: make_digits (variable_base/mod.rs:754-793).
    Requires c <= 16 so a window spans at most two 16-bit limbs.
    """
    assert 1 <= c <= 16
    Ls = spec.num_limbs
    mask = np.uint32((1 << c) - 1)
    half = np.uint32(1 << (c - 1))
    n = scalars.shape[1]
    carry = jnp.zeros((n,), dtype=jnp.uint32)
    outs = []
    for w in range(num_windows):
        bitpos = w * c
        limb = bitpos // 16
        off = bitpos % 16
        if limb < Ls:
            raw = scalars[limb] >> off
            if off + c > 16 and limb + 1 < Ls:
                raw = raw | (scalars[limb + 1] << (16 - off))
            raw = raw & mask
        else:
            raw = jnp.zeros((n,), dtype=jnp.uint32)
        coef = raw + carry
        carry = (coef + half) >> c
        digit = coef.astype(jnp.int32) - (carry << c).astype(jnp.int32)
        outs.append(digit)
    return jnp.stack(outs)


def _auto_groups(n: int, w: int, nbuckets: int, limbs: int) -> int:
    """Pick G (point groups per window) so cross-group reduction work
    (W·G·B adds) stays well under scan work (W·N) and bucket state fits."""
    g = max(1, n // (4 * nbuckets))
    # state bytes = 4 coords · limbs · W·G · B · 4
    while g > 1 and 16 * limbs * w * g * nbuckets > (3 << 30):
        g //= 2
    # g must divide padded n; round down to a power of two
    g = 1 << (g.bit_length() - 1)
    return g


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm(
    curve: SWCurveSpec,
    points: AffinePoints,
    scalars: jnp.ndarray,
    c: Optional[int] = None,
    groups: Optional[int] = None,
) -> XYZZPoints:
    """Σ scalars_i · points_i. ``scalars``: canonical limbs (Ls, N).

    Returns a single XYZZ point (batch shape ()); use sw.xyzz_to_affine.
    """
    f = curve.base
    L = f.num_limbs
    n = points.x.shape[1]
    if c is None:
        c = default_window_size(n)
    half = 1 << (c - 1)
    B = half + 1  # bucket magnitudes 0..half (0 unused)
    scalar_bits = curve.scalar.bits
    W = scalar_bits // c + 1 + (1 if scalar_bits % c else 0)
    G = groups or _auto_groups(n, W, B, L)
    T = -(-n // G)  # points per group (scan length)
    pad = G * T - n

    digits = signed_digits(curve.scalar, scalars, c, W)  # (W, N) int32
    px, py = points.x, points.y
    pinf = points.inf
    if pad:
        px = jnp.pad(px, ((0, 0), (0, pad)))
        py = jnp.pad(py, ((0, 0), (0, pad)))
        pinf = jnp.pad(pinf, (0, pad), constant_values=True)
        digits = jnp.pad(digits, ((0, 0), (0, pad)))
    py_neg = fp.neg(f, py)

    # rearrange: point index = g·T + t → (T, ..., G)
    def to_tg(a):  # (..., G*T) -> (T, ..., G)
        a2 = a.reshape(a.shape[:-1] + (G, T))
        return jnp.moveaxis(a2, -1, 0)

    xs = (to_tg(px), to_tg(py), to_tg(py_neg), to_tg(pinf), to_tg(digits))
    K = W * G

    lanes = jnp.arange(K)
    state0 = sw.xyzz_zero(curve, (K, B))

    def step(state, xs_t):
        x_t, y_t, yneg_t, inf_t, dig_t = xs_t  # (L,G),(L,G),(L,G),(G,),(W,G)
        mag = jnp.abs(dig_t).reshape(K)  # (K,) — lane (w,g) flattened
        negm = (dig_t < 0).reshape(K)
        skip = (mag == 0) | jnp.broadcast_to(inf_t[None, :], (W, G)).reshape(K)
        # broadcast point coords across windows: (L, G) -> (L, K)
        xb = jnp.broadcast_to(x_t[:, None, :], (L, W, G)).reshape(L, K)
        yb = jnp.broadcast_to(y_t[:, None, :], (L, W, G)).reshape(L, K)
        ynb = jnp.broadcast_to(yneg_t[:, None, :], (L, W, G)).reshape(L, K)
        A = AffinePoints(xb, fp.select(negm, ynb, yb), skip)
        # gather each lane's bucket
        sel = XYZZPoints(*(s[:, lanes, mag] for s in state))  # (L, K) each
        new = sw.xyzz_add_affine(curve, sel, A)
        state = XYZZPoints(
            *(s.at[:, lanes, mag].set(v) for s, v in zip(state, new))
        )
        return state, None

    state, _ = jax.lax.scan(step, state0, xs)

    # reshape lanes back to (W, G): (L, K, B) -> (L, W, G, B)
    bk = XYZZPoints(*(s.reshape(L, W, G, B) for s in state))
    # tree-reduce across G
    g = G
    while g > 1:
        h = g // 2
        lo = XYZZPoints(*(s[:, :, :h] for s in bk))
        hi = XYZZPoints(*(s[:, :, h : 2 * h] for s in bk))
        merged = sw.xyzz_add(curve, lo, hi)
        if g % 2:
            tail = XYZZPoints(*(s[:, :, 2 * h :] for s in bk))
            merged = XYZZPoints(
                *(jnp.concatenate([m, t], axis=2) for m, t in zip(merged, tail))
            )
            g = h + 1
        else:
            g = h
        bk = merged
    bk = XYZZPoints(*(s[:, :, 0] for s in bk))  # (L, W, B)

    # suffix sums over buckets 1..half: S_b = Σ_{j>=b} bucket_j, then
    # window_sum = Σ_b b·bucket_b = Σ_b S_b (reference :477-484)
    body = XYZZPoints(*(s[:, :, 1:] for s in bk))  # (L, W, half)
    suffix = jax.lax.associative_scan(
        lambda p, q: sw.xyzz_add(curve, p, q), body, axis=2, reverse=True
    )
    # tree-sum the suffix array over the bucket axis
    m = half
    acc = suffix
    while m > 1:
        h = m // 2
        lo = XYZZPoints(*(s[:, :, :h] for s in acc))
        hi = XYZZPoints(*(s[:, :, h : 2 * h] for s in acc))
        red = sw.xyzz_add(curve, lo, hi)
        if m % 2:
            red = XYZZPoints(
                *(jnp.concatenate([r, s[:, :, 2 * h :]], axis=2) for r, s in zip(red, acc))
            )
            m = h + 1
        else:
            m = h
        acc = red
    win = XYZZPoints(*(s[:, :, 0] for s in acc))  # (L, W)

    # Horner over windows, high→low: total = (total · 2^c) + win_w
    def outer(w, tot):
        def dbl(_, t):
            return sw.xyzz_double(curve, t)

        tot = jax.lax.fori_loop(0, c, dbl, tot)
        w_idx = W - 2 - w
        wp = XYZZPoints(*(jax.lax.dynamic_index_in_dim(s, w_idx, axis=1, keepdims=False) for s in win))
        return sw.xyzz_add(curve, tot, wp)

    top = XYZZPoints(*(s[:, W - 1] for s in win))
    total = jax.lax.fori_loop(0, W - 1, outer, top)
    return total


def msm_affine(curve, points, scalars, c=None, groups=None) -> AffinePoints:
    res = msm(curve, points, scalars, c, groups)
    return sw.xyzz_to_affine(curve, XYZZPoints(*(s.reshape(s.shape + (1,)) for s in res)))
