"""Variable-base multi-scalar multiplication (Pippenger), TPU-shaped.

Reference analog: ark-ec's VariableBaseMSM signed-digit Pippenger
(ec/src/scalar_mul/variable_base/mod.rs:242-793): window digits recentered to
[-2^(c-1), 2^(c-1)] (make_digits :754-793), per-window bucket accumulation in
XYZZ coordinates, bucket suffix sums, Horner window combine.

TPU design — "aligned bucket rounds": the CPU reference scatters each point
into buckets[digit] (mod.rs:464-475), a data-dependent scatter that is hostile
to XLA. Instead:

1.  Per window, sort point indices by |digit| (one batched lax.sort).
2.  From the sorted keys, compute each bucket's [start, end) range via a
    vectorized binary search — bucket b's r-th point sits at sorted position
    start[b] + r.
3.  Round r then adds, FOR EVERY BUCKET AT ONCE, its r-th point:
    a (W, B)-shaped gather followed by one dense batched XYZZ mixed-add into
    the (W, B) bucket array. No scatter exists anywhere: the bucket axis is
    aligned with the lane axis by construction, and no two points target the
    same bucket within a round.
4.  ``rounds = max bucket occupancy`` (a lax.while_loop bound): work is
    W·(N + slack) mixed adds — the Pippenger optimum plus the occupancy
    imbalance — and every add runs at W·B-lane batch width.
5.  Bucket reduction Σ b·bucket_b uses a two-level chunked suffix scheme
    (reference :477-484 does serial suffix sums), then Horner across windows.

Degenerate inputs (e.g. all scalars equal) stay correct: the while_loop just
runs more rounds.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.core.sort import bitonic_sort_kv
from zkarray.ec import sw
from zkarray.ec.sw import AffinePoints, SWCurveSpec, XYZZPoints
from zkarray.ff import fp


def default_window_size(n: int) -> int:
    """Window size heuristic. The reference uses ln(n)+2 (ec/src/scalar_mul/
    mod.rs:22-25) to balance N·W bucket adds against W·2^c bucket reduction;
    the aligned-rounds design additionally pays per-round occupancy slack
    ~sqrt(2^c·ln(B)/N) relative, which favours slightly smaller windows:
    c ≈ log2(n)/2 + 3."""
    if n <= 32:
        return 3
    return max(3, min(16, int(math.log2(n)) // 2 + 3))


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def signed_digits(spec, scalars: jnp.ndarray, c: int, num_windows: int) -> jnp.ndarray:
    """Scalar limbs (canonical) -> signed window digits (W, N) int32 in
    [-2^(c-1), 2^(c-1)]. Reference: make_digits (variable_base/mod.rs:754-793).
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


def _searchsorted_batch(keys: jnp.ndarray, n_vals: int) -> jnp.ndarray:
    """starts[w, v] = first index i with keys[w, i] >= v+1, for v in
    [0, n_vals); keys (W, N) sorted int32. Vectorized binary search
    (log2(N) select passes), batched over windows."""
    W, N = keys.shape
    vals = jnp.arange(1, n_vals + 1, dtype=jnp.int32)[None, :]  # (1, V)
    lo = jnp.zeros((W, n_vals), dtype=jnp.int32)
    hi = jnp.full((W, n_vals), N, dtype=jnp.int32)
    steps = max(1, int(math.ceil(math.log2(max(N, 2)))) + 1)
    for _ in range(steps):
        active = lo < hi
        mid = (lo + hi) >> 1  # < N whenever active (hi <= N, lo < hi)
        km = jnp.take_along_axis(keys, jnp.minimum(mid, N - 1), axis=1)
        go_right = active & (km < vals)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
    return hi  # == lo


def _weighted_bucket_sum(
    curve: SWCurveSpec, bk: XYZZPoints, s: int, restart_weights: bool = False
) -> XYZZPoints:
    """Σ_{j=0..B-1} (j+1)·bk[..., j] per window, bk coords (L, W, B).

    Two-level chunked suffix sums: within chunks of size s (vectorized across
    all W·(B/s) chunks) and then across chunks — 2·(B + B/s) point adds total,
    ~2 sequential adds per step. Reference computes the same quantity with a
    serial running suffix (variable_base/mod.rs:477-484).

    ``restart_weights``: weights restart at 1 at each chunk boundary
    (weight of slot j = (j mod s) + 1) instead of running 1..B — used for
    the sub-bucket-split top window, where slot d + s·k holds bucket d.
    """
    L, W, B = bk.x.shape
    assert B % s == 0
    C = B // s
    ch = XYZZPoints(*(v.reshape(L, W, C, s) for v in bk))

    def at(v, i):
        return jax.lax.dynamic_index_in_dim(v, i, axis=3, keepdims=False)

    zero = sw.xyzz_zero(curve, (W, C))

    def body1(i, carry):
        run, acc = carry
        idx = s - 1 - i
        p = XYZZPoints(*(at(v, idx) for v in ch))
        run = sw.xyzz_add(curve, run, p)
        acc = sw.xyzz_add(curve, acc, run)
        return run, acc

    run, acc = jax.lax.fori_loop(0, s, body1, (zero, zero))
    # run = per-chunk plain sum A_c; acc = per-chunk weighted sum (weights 1..s)

    def at2(v, i):
        return jax.lax.dynamic_index_in_dim(v, i, axis=2, keepdims=False)

    zero_w = sw.xyzz_zero(curve, (W,))

    def body2(i, carry):
        run2, acc2, tot = carry
        cidx = C - 1 - i
        a_c = XYZZPoints(*(at2(v, cidx) for v in run))
        t_c = XYZZPoints(*(at2(v, cidx) for v in acc))
        tot = sw.xyzz_add(curve, tot, t_c)  # Σ_c T_c
        acc2 = sw.xyzz_add(curve, acc2, run2)  # Σ_{c>=1} Σ_{j>=c} A_j = Σ c·A_c
        run2 = sw.xyzz_add(curve, run2, a_c)
        return run2, acc2, tot

    # Process c = C-1 .. 0; acc2 accumulates run2 BEFORE adding A_c so that
    # A_c is counted c times: after all steps acc2 = Σ_c c·A_c.
    _, acc2, tot = jax.lax.fori_loop(0, C, body2, (zero_w, zero_w, zero_w))

    if restart_weights:
        return tot  # Σ_c T_c: per-chunk weights only

    # total = Σ_c T_c + s·(Σ_c c·A_c)
    def dbl_n(v, k):
        return jax.lax.fori_loop(0, k, lambda _, t: sw.xyzz_double(curve, t), v)

    assert s & (s - 1) == 0
    scaled = dbl_n(acc2, int(math.log2(s)))
    return sw.xyzz_add(curve, tot, scaled)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm(
    curve: SWCurveSpec,
    points: AffinePoints,
    scalars: jnp.ndarray,
    c: Optional[int] = None,
    max_scalar_bits: Optional[int] = None,
) -> XYZZPoints:
    """Σ scalars_i · points_i. ``scalars``: canonical limbs (Ls, N).

    Returns a single XYZZ point (batch shape ()); use sw.xyzz_to_affine.
    Matches VariableBaseMSM::msm (variable_base/mod.rs:437-503) output.

    ``max_scalar_bits`` is the TPU-shaped magnitude specialization
    (reference msm_signed's ±u8/±u16/... width classes,
    variable_base/mod.rs:242-347): a static bound on every scalar's bit
    length shrinks the window count W — the compiled kernel does
    proportionally less work. Use msm_mixed() for per-class dispatch of
    heterogeneous scalar batches.
    """
    f = curve.base
    L = f.num_limbs
    n = points.x.shape[1]
    if c is None:
        c = default_window_size(n)
    half = 1 << (c - 1)  # buckets 1..half; slot j holds bucket j+1
    scalar_bits = curve.scalar.bits
    if max_scalar_bits is not None:
        scalar_bits = min(scalar_bits, max_scalar_bits)
    # Smallest window count whose top window cannot produce a recentering
    # carry-out: needs scalar_bits - c·(W-1) <= c - 2 so the top coefficient
    # (raw bits + carry-in) stays below 2^(c-1) and signed_digits' final
    # carry is provably zero.
    W = (scalar_bits + c + 1) // c

    digits = signed_digits(curve.scalar, scalars, c, W)  # (W, N) int32
    mag = jnp.abs(digits)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (W, n))

    # Tail-window sub-bucket split. Windows past the scalar width span only
    # rem_w = scalar_bits - c·w leftover bits, so their |digit| takes just
    # v_w = 2^rem_w + 1 values; with uniform scalars those buckets hold
    # ~half/v_w times more points than a full window's, and since the round
    # loop runs to the GLOBAL max occupancy this skew multiplies the whole
    # MSM's round count (measured 28x at 2^18/c=10, where the 255-bit
    # scalar leaves window 25 with 5 bits). Spreading each narrow digit
    # over K_w = half // v_w slots (slot = d + v_w·(i mod K_w)) rebalances;
    # the reduction below sums split windows with per-chunk restarting
    # weights. Split windows are always a suffix of the window range.
    splits = []  # [(w, v_w, K_w)] for windows that get sub-bucketed
    for w in range(W):
        rem_w = max(0, min(c, scalar_bits - c * w))
        v_w = (1 << rem_w) + 1
        K_w = max(1, half // v_w)
        if K_w >= 2:
            splits.append((w, v_w, K_w))
    for w, v_w, K_w in splits:
        row = mag[w]
        sub = (iota[0] % K_w) * v_w
        mag = mag.at[w].set(jnp.where(row > 0, row + sub, 0))
    W_main = splits[0][0] if splits else W  # split windows are a suffix

    # Per-window sort by |digit| (sub-bucket slot id for the top window).
    # XLA's sort op measures fine on TPU at MSM sizes (12 s compile / 20 ms
    # run at (26, 2^18)); core/sort.py's bitonic network is the
    # compile-bounded fallback for shapes where it isn't.
    keys, sidx = jax.lax.sort_key_val(mag, iota, dimension=1)
    ssign = jnp.take_along_axis(digits < 0, sidx, axis=1)  # (W, N) bool

    # bucket b (1..half) occupies sorted range [S[b-1], S[b]) where
    # S[v-1] = first index with key >= v; S has half+1 entries (v=1..half+1)
    S = _searchsorted_batch(keys, half + 1)  # (W, half+1)
    counts = S[:, 1:] - S[:, :-1]  # (W, half)
    rounds = jnp.max(counts)

    state0 = sw.xyzz_zero(curve, (W, half))
    px, py, pinf = points.x, points.y, points.inf

    # The round loop is gather-latency-bound (measured 2^22/c=14: ~15 ms of
    # a 20 ms round in index lookups + coordinate gathers vs 5.5 ms in the
    # fused add kernel). Two packing tricks halve the gather count:
    # * sign and infinity ride in the top bits of the sorted index array,
    #   so ONE take_along_axis per round replaces three;
    # * x and y are stacked into one (2L, N) array, so ONE coordinate
    #   gather per round replaces two.
    assert n < (1 << 29)
    packed = (
        sidx
        | (ssign.astype(jnp.int32) << 30)
        | (pinf[sidx].astype(jnp.int32) << 29)
    )  # (W, N)
    # Coordinate store for the round gathers: x‖y with limb PAIRS packed
    # into full uint32 words (planar limbs only occupy 16 of 32 bits) —
    # halves the gathered bytes per round. Unpacked right after the gather.
    assert L % 2 == 0
    pxy = jnp.concatenate([px, py], axis=0)  # (2L, N)
    pxy = pxy[0::2] | (pxy[1::2] << 16)  # (L, N): row k = limbs 2k | 2k+1

    def cond(carry):
        return carry[0] < rounds

    def body(carry):
        r, state = carry
        pos = S[:, :-1] + r  # (W, half)
        valid = pos < S[:, 1:]
        posc = jnp.where(valid, pos, 0)
        pk = jnp.take_along_axis(packed, posc, axis=1)  # (W, half)
        idx = pk & ((1 << 29) - 1)
        sg = (pk >> 30) & 1
        g = pxy[:, idx]  # (L, W, half) packed limb pairs
        g = jnp.stack([g & 0xFFFF, g >> 16], axis=1).reshape(2 * L, W, half)
        gx, gy = g[:L], g[L:]
        ginf = ((pk >> 29) & 1).astype(bool) | ~valid
        gy = fp.select(sg.astype(bool), fp.neg(f, gy), gy)
        state = sw.xyzz_add_affine(curve, state, AffinePoints(gx, gy, ginf))
        return r + jnp.int32(1), state

    _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state0))

    # per-window weighted bucket reduction
    s_chunk = 1 << (int(math.log2(half)) // 2) if half >= 4 else 1
    if half % s_chunk or s_chunk == 1:
        s_chunk = half  # tiny windows: single chunk

    def _fold_pairs(parts, k):
        """Tree-add k pseudo-window partials (coords (L, k)) into one."""
        while k > 1:
            h = k // 2
            lo_p = XYZZPoints(*(v[:, :h] for v in parts))
            hi_p = XYZZPoints(*(v[:, h : 2 * h] for v in parts))
            red = sw.xyzz_add(curve, lo_p, hi_p)
            if k % 2:
                red = XYZZPoints(
                    *(
                        jnp.concatenate([a, v[:, 2 * h :]], axis=1)
                        for a, v in zip(red, parts)
                    )
                )
                k = h + 1
            else:
                k = h
            parts = red
        return parts

    if splits:
        cols = []
        if W_main:
            low = XYZZPoints(*(v[:, :W_main] for v in state))
            cols.append(_weighted_bucket_sum(curve, low, s_chunk))  # (L, W_main)
        for w, v_w, K_w in splits:
            # window w: slot d + v_w·k holds bucket d; reshape the used
            # prefix into K_w pseudo-windows of v_w slots, weight each with
            # restarting 1..v_w, then fold the K_w partials together.
            st_w = XYZZPoints(
                *(v[:, w, : K_w * v_w].reshape(L, K_w, v_w) for v in state)
            )
            parts = _weighted_bucket_sum(curve, st_w, v_w, restart_weights=True)
            folded = _fold_pairs(parts, K_w)
            cols.append(XYZZPoints(*(v[:, :1] for v in folded)))
        win = XYZZPoints(
            *(jnp.concatenate(vs, axis=1) for vs in zip(*cols))
        )
    else:
        win = _weighted_bucket_sum(curve, state, s_chunk)  # coords (L, W)

    # Horner over windows, high→low: total = (total · 2^c) + win_w
    def outer(w, tot):
        tot = jax.lax.fori_loop(0, c, lambda _, t: sw.xyzz_double(curve, t), tot)
        w_idx = W - 2 - w
        wp = XYZZPoints(
            *(
                jax.lax.dynamic_index_in_dim(v, w_idx, axis=1, keepdims=False)
                for v in win
            )
        )
        return sw.xyzz_add(curve, tot, wp)

    top = XYZZPoints(*(v[:, W - 1] for v in win))
    total = jax.lax.fori_loop(0, W - 1, outer, top)
    return total


def msm_affine(curve, points, scalars, c=None) -> AffinePoints:
    res = msm(curve, points, scalars, c)
    return sw.xyzz_to_affine(
        curve, XYZZPoints(*(v.reshape(v.shape + (1,)) for v in res))
    )


# ---------------------------------------------------------------------------
# magnitude-partitioned front-end (reference msm_signed's ScalarSize classes,
# ec/src/scalar_mul/variable_base/mod.rs:242-434)
# ---------------------------------------------------------------------------

SCALAR_CLASSES = (1, 8, 16, 32, 64)


def classify_scalars(scalars_np: np.ndarray, num_bits: int):
    """Host pass: scalar limb matrix (Ls, N) -> per-class index arrays.

    The reference classifies at runtime and par-sorts (mod.rs:251-290); on
    TPU the class split must be STATIC to specialize the compiled kernels,
    so classification runs on the host (a cheap O(N·Ls) numpy pass) and each
    class gets its own fixed-shape MSM. Returns [(bits, idx_array)] with
    every scalar in exactly one class; empty classes omitted.
    """
    Ls, n = scalars_np.shape
    # bit length per scalar from the top nonzero limb
    bitlen = np.zeros(n, dtype=np.int64)
    for i in range(Ls):
        limb = scalars_np[i].astype(np.int64)
        nz = limb != 0
        lb = np.zeros(n, dtype=np.int64)
        lb[nz] = np.floor(np.log2(limb[nz])).astype(np.int64) + 1
        bitlen = np.where(nz, 16 * i + lb, bitlen)
    out = []
    prev = 0
    for b in SCALAR_CLASSES + (num_bits,):
        if b > num_bits:
            b = num_bits
        sel = np.nonzero((bitlen > prev) & (bitlen <= b))[0]
        if sel.size:
            out.append((b, sel))
        prev = b
        if b == num_bits:
            break
    # scalars that are exactly zero contribute nothing — drop them
    return out


def _msm_binary(curve: SWCurveSpec, points: AffinePoints) -> XYZZPoints:
    """Σ P_i (all scalars = 1): log-tree XYZZ reduction — the reference's
    msm_binary (mod.rs:373-390) without the sort."""
    n = points.x.shape[1]
    st = sw.xyzz_from_affine(curve, points)
    m = n
    while m > 1:
        h = m // 2
        lo = XYZZPoints(*(v[..., :h] for v in st))
        hi = XYZZPoints(*(v[..., h : 2 * h] for v in st))
        red = sw.xyzz_add(curve, lo, hi)
        if m % 2:
            red = XYZZPoints(
                *(
                    jnp.concatenate([a, v[..., 2 * h :]], axis=-1)
                    for a, v in zip(red, st)
                )
            )
            m = h + 1
        else:
            m = h
        st = red
    return XYZZPoints(*(v[..., 0] for v in st))


def msm_mixed(
    curve: SWCurveSpec,
    points: AffinePoints,
    scalars: jnp.ndarray,
    c: Optional[int] = None,
) -> XYZZPoints:
    """Magnitude-partitioned MSM: classify on host, dispatch each class to
    a width-specialized kernel, add the partial results (reference
    msm_signed, mod.rs:242-347). Syncs the scalars to host once.
    """
    sc_np = np.asarray(scalars)
    num_bits = curve.scalar.bits
    classes = classify_scalars(sc_np, num_bits)
    total = None
    for bits, idx in classes:
        sub_pts = AffinePoints(
            points.x[:, idx], points.y[:, idx], points.inf[idx]
        )
        if bits <= 1:
            part = _msm_binary(curve, sub_pts)
        else:
            part = msm(
                curve, sub_pts, scalars[:, idx], c, int(bits)
            )
        total = part if total is None else sw.xyzz_add(curve, total, part)
    if total is None:
        return sw.xyzz_zero(curve, ())
    return total
