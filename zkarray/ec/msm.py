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
4.  Work is W·(N + slack) mixed adds — the Pippenger optimum plus the
    occupancy imbalance — and every add runs at W·B-lane batch width. On
    TPU the whole accumulate is TWO static-bound pallas grid sweeps per
    window group (_accum_grid): slots are permuted by bucket occupancy so
    band 1 covers mean+2σ rounds at full width and band 2 continues only
    the top-⅛ occupancy prefix; both feeds are built by two HOISTED
    gathers (payload rows then coordinate rows) laid out exactly as the
    kernel consumes them, and each bucket block stays VMEM-resident
    across all its rounds (kernels/sw.py:xyzz_accum_grid). A dynamic
    while_loop residual finishes adversarial occupancy tails, so the
    static bounds are performance choices, never correctness assumptions.
5.  Bucket reduction Σ b·bucket_b decomposes the weights into bits — per
    bit one masked full-width tree-sum (reference :477-484 does serial
    suffix sums) — then a single-launch Horner kernel walks the ~c·W
    serial doubling tail (kernels/sw.py:horner_windows).

Degenerate inputs (e.g. all scalars equal) stay correct: the while_loop just
runs more rounds. ChunkedMSM streams fixed-size chunks through the same
bucket state for larger-than-HBM inputs (2^24–2^26).
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

import os

# Rounds per accumulation-kernel launch (VMEM-resident bucket state).
ACCUM_T = int(os.environ.get("ZKARRAY_MSM_TILE_T", "16"))


def _pack_pairs(a: jnp.ndarray) -> jnp.ndarray:
    """(2k, ...) 16-bit limb rows -> (k, ...) full u32 words."""
    return a[0::2] | (a[1::2] << 16)


def _unpack_pairs(w: jnp.ndarray) -> jnp.ndarray:
    """(k, ...) packed words -> (2k, ...) 16-bit limb rows."""
    k = w.shape[0]
    return jnp.stack([w & 0xFFFF, w >> 16], axis=1).reshape((2 * k,) + w.shape[1:])


def _accum_bounds(c: int, n: int, T: int):
    """Static per-band round bounds from bucket-occupancy statistics.

    Bucket occupancy is ~Poisson(mean = n/half). Band 1 sweeps ALL buckets
    for mean + R1_SIG·σ rounds (covers all but the upper tail); band 2
    continues only the top-occupancy ⅛ prefix for R2_SIG·σ more rounds.
    Anything beyond (adversarial inputs, e.g. all-equal scalars) falls to
    the dynamic residual loop — the bounds are a PERFORMANCE choice, never
    a correctness assumption. Static bounds keep the whole accumulate
    traceable (no host sync) at a measured ~5% work premium over exact
    occupancy-synced bands."""
    half = 1 << (c - 1)
    mean = max(1.0, n / half)
    sig = math.sqrt(mean)
    r1s = float(os.environ.get("ZKARRAY_MSM_R1_SIG", "2.0"))
    r2s = float(os.environ.get("ZKARRAY_MSM_R2_SIG", "5.0"))
    r1 = max(T, int(math.ceil((mean + r1s * sig) / T)) * T)
    r2 = max(T, int(math.ceil((r2s * sig) / T)) * T)
    return r1, r2


def _group_windows(W: int, half: int, r1b: int) -> int:
    """Windows whose padded band-1 feed is materialized together: bounded
    by the HBM budget for one group's coordinate feed (r1b·half·96 bytes
    per window). Override via ZKARRAY_MSM_GROUP_BYTES."""
    budget = int(os.environ.get("ZKARRAY_MSM_GROUP_BYTES", str(700 << 20)))
    per_window = r1b * half * 96
    return max(1, min(W, budget // max(per_window, 1)))


def _accum_grid(curve, packed, S, counts, pxy, state, c, scalar_bits):
    """TPU kernel-path accumulate: two static-bound pallas grid sweeps per
    window group over a PADDED PRESORTED feed, plus a dynamic residual.

    Per group of windows (sized to HBM):
    1. Permute the group's (window, bucket) slots by occupancy, descending
       (device argsort of the counts — so high-occupancy buckets form a
       prefix and the long tail can be continued at ⅛ width).
    2. Build the band-1 feed with TWO HOISTED GATHERS — the payload rows
       (4 B, ~9 ns/idx) then the coordinate rows (96 B limb-major,
       ~12 ns/idx) — laid out exactly as the grid kernel consumes them:
       no per-round dispatches, slices, or transposes remain.
    3. One xyzz_accum_grid call sweeps all band-1 rounds with each bucket
       block VMEM-resident; a second sweeps band 2 over the top-K prefix.
    4. A while_loop residual (normally 0 iterations) finishes any bucket
       whose occupancy exceeds the static bounds.
    Reference analog being replaced: the serial scatter loop of
    ec/src/scalar_mul/variable_base/mod.rs:464-475.
    """
    f = curve.base
    L = f.num_limbs
    Lp = L // 2
    W, half, _, _ = _window_geometry(c, scalar_bits)
    N = packed.shape[1]
    T = ACCUM_T
    r1b, r2b = _accum_bounds(c, N, T)
    G = _group_windows(W, half, r1b)
    from zkarray.kernels import sw as ksw

    packed_flat = packed.reshape(W * N)
    idx_mask = (1 << 29) - 1

    def padded_feed(slo, base, cnt, r_start, R):
        """(R-round, width-slot) payload + coord feed for the grid kernel.
        slo/base/cnt: (width,) permuted slot fences. Returns coords
        (L, R, nbw, 8, 128) and vwords (R, nbw, 8, 128) with bit0 = valid,
        bit1 = negate-y."""
        width = slo.shape[0]
        nbw = width // 1024
        t = jnp.arange(R, dtype=jnp.int32)
        pos = slo[None, :] + (r_start + t)[:, None]  # (R, width)
        valid = pos < (slo + cnt)[None, :]
        posc = jnp.where(valid, pos, 0)
        pk = jnp.take(packed_flat, (base[None] + posc).reshape(-1))
        pk = pk.reshape(R, width)
        idx = (pk & idx_mask).reshape(-1)
        sgn = (pk >> 30) & 1
        vword = valid.astype(jnp.int32) | (sgn << 1)
        g = pxy[:, idx]  # (L, R·width)
        coords = g.reshape(L, R, nbw, 8, 128)
        vw = vword.reshape(R, nbw, 8, 128)
        return coords, vw

    out_parts = []
    for g0 in range(0, W, G):
        g1 = min(W, g0 + G)
        Gg = g1 - g0
        WB = Gg * half
        nb = -(-WB // 1024)
        WBp = nb * 1024
        pad = WBp - WB

        cnt = jnp.pad(counts[g0:g1].reshape(WB), (0, pad))
        slo = jnp.pad(S[g0:g1, :-1].reshape(WB), (0, pad))
        base = jnp.pad(
            jnp.broadcast_to(
                (jnp.arange(g0, g1, dtype=jnp.int32) * N)[:, None], (Gg, half)
            ).reshape(WB),
            (0, pad),
        )
        # occupancy-descending slot permutation (pad slots have count 0)
        order = jnp.argsort(-cnt)
        cnt_s, slo_s, base_s = cnt[order], slo[order], base[order]

        st_g = XYZZPoints(*(v[:, g0:g1] for v in state))
        rws = jnp.concatenate(
            [_pack_pairs(v.reshape(L, WB)) for v in st_g], axis=0
        )  # (2L, WB)
        rws = jnp.pad(rws, ((0, 0), (0, pad)))[:, order]
        stp = rws.reshape(2 * L, nb, 8, 128).transpose(1, 0, 2, 3)

        # band 1: all slots, r1b rounds
        c1, v1 = padded_feed(slo_s, base_s, cnt_s, 0, r1b)
        stp = ksw.xyzz_accum_grid(curve, stp, c1, v1, T)

        # band 2: top-occupancy prefix only
        kb = max(1, nb // 8)
        K = kb * 1024
        if K < WBp:
            c2, v2 = padded_feed(slo_s[:K], base_s[:K], cnt_s[:K], r1b, r2b)
            st2 = ksw.xyzz_accum_grid(curve, stp[:kb], c2, v2, T)
            stp = jnp.concatenate([st2, stp[kb:]], axis=0)
            done = jnp.where(
                jnp.arange(WBp, dtype=jnp.int32) < K, r1b + r2b, r1b
            )
        else:
            c2, v2 = padded_feed(slo_s, base_s, cnt_s, r1b, r2b)
            stp = ksw.xyzz_accum_grid(curve, stp, c2, v2, T)
            done = jnp.full((WBp,), r1b + r2b, dtype=jnp.int32)

        # dynamic residual for occupancy beyond the static bounds
        rem_max = jnp.max(jnp.maximum(cnt_s - done, 0))
        rT = jnp.arange(T, dtype=jnp.int32)

        def cond(carry):
            return carry[0] < rem_max

        def body(carry):
            t0, st = carry
            pos = (slo_s + done)[None, :] + (t0 + rT)[:, None]  # (T, WBp)
            valid = pos < (slo_s + cnt_s)[None, :]
            posc = jnp.where(valid, pos, 0)
            pk = jnp.take(
                packed_flat, (base_s[None] + posc).reshape(-1)
            ).reshape(T, WBp)
            sgn = (pk >> 30) & 1
            vword = valid.astype(jnp.int32) | (sgn << 1)
            g = pxy[:, (pk & idx_mask).reshape(-1)]
            coords = (
                g.reshape(L, T, nb, 8, 128)
                .transpose(2, 1, 0, 3, 4)
                .reshape(nb, T * L, 8, 128)
            )
            vw = vword.reshape(T, nb, 8, 128).transpose(1, 0, 2, 3)
            st = ksw.xyzz_accum_tiles(curve, st, coords, vw, T)
            return t0 + T, st

        _, stp = jax.lax.while_loop(cond, body, (jnp.int32(0), stp))

        # un-permute and unpack the group's bucket state
        rws = stp.transpose(1, 0, 2, 3).reshape(2 * L, WBp)
        inv = jnp.argsort(order)
        rws = rws[:, inv][:, :WB]
        parts = [_unpack_pairs(rws[i * Lp : (i + 1) * Lp]) for i in range(4)]
        out_parts.append(
            XYZZPoints(*(p.reshape(L, Gg, half) for p in parts))
        )
    if len(out_parts) == 1:
        return out_parts[0]
    return XYZZPoints(
        *(jnp.concatenate(vs, axis=1) for vs in zip(*out_parts))
    )


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


def _window_geometry(c: int, scalar_bits: int):
    """(W, half, splits, W_main) for a window size and scalar bit bound.

    W is the smallest window count whose top window cannot produce a
    recentering carry-out: scalar_bits - c*(W-1) <= c - 2 keeps the top
    coefficient below 2^(c-1) so signed_digits' final carry is provably 0.
    ``splits`` implements the tail-window sub-bucket rebalance (see
    msm_accumulate docstring): [(w, v_w, K_w)] suffix windows whose narrow
    digit range is spread over K_w sub-slots.
    """
    half = 1 << (c - 1)
    W = (scalar_bits + c + 1) // c
    splits = []
    for w in range(W):
        rem_w = max(0, min(c, scalar_bits - c * w))
        v_w = (1 << rem_w) + 1
        K_w = max(1, half // v_w)
        if K_w >= 2:
            splits.append((w, v_w, K_w))
    W_main = splits[0][0] if splits else W
    return W, half, splits, W_main


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm_accumulate(
    curve: SWCurveSpec,
    points: AffinePoints,
    scalars: jnp.ndarray,
    c: int,
    scalar_bits: int,
    state: XYZZPoints,
) -> XYZZPoints:
    """Accumulate one point/scalar chunk into the (W, half) bucket state.

    The chunked-MSM building block (reference ChunkedPippenger's
    add_chunk, ec/src/scalar_mul/variable_base/stream_pippenger.rs:10-70 —
    but carrying BUCKET state across chunks instead of flushing to a
    running total, so chunking costs no extra bucket reductions).
    """
    f = curve.base
    L = f.num_limbs
    n = points.x.shape[1]
    W, half, splits, _ = _window_geometry(c, scalar_bits)

    digits = signed_digits(curve.scalar, scalars, c, W)  # (W, N) int32
    mag = jnp.abs(digits)
    # Points at infinity contribute nothing: zero their digits so they sort
    # below every bucket fence and are never fetched (the presorted kernel
    # path relies on this; the XLA fallback also carries an inf payload bit).
    mag = jnp.where(points.inf[None, :], 0, mag)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (W, n))

    # Tail-window sub-bucket split. Windows past the scalar width span only
    # rem_w = scalar_bits - c*w leftover bits, so their |digit| takes just
    # v_w = 2^rem_w + 1 values; with uniform scalars those buckets hold
    # ~half/v_w times more points than a full window's, and since the round
    # loop runs to the GLOBAL max occupancy this skew multiplies the whole
    # MSM's round count (measured 28x at 2^18/c=10, where the 255-bit
    # scalar leaves window 25 with 5 bits). Spreading each narrow digit
    # over K_w = half // v_w slots (slot = d + v_w*(i mod K_w)) rebalances;
    # the reduction sums split windows with per-chunk restarting weights.
    for w, v_w, K_w in splits:
        row = mag[w]
        sub = (iota[0] % K_w) * v_w
        mag = mag.at[w].set(jnp.where(row > 0, row + sub, 0))

    px, py, pinf = points.x, points.y, points.inf

    # sign and infinity bits ride IN THE SORT PAYLOAD (top bits of the
    # point index): the sort carries them to sorted order for free, where
    # a post-sort take_along_axis for sign + a pinf gather would cost two
    # full (W, N) gathers (~14 ns/element on this TPU — measured 120 ms at
    # 2^18/c=13, dwarfing the 12 ms sort itself).
    assert n < (1 << 29)
    payload = (
        iota
        | ((digits < 0).astype(jnp.int32) << 30)
        | (pinf[None, :].astype(jnp.int32) << 29)
    )
    # Per-window sort by |digit| (sub-bucket slot id for split windows).
    keys, packed = jax.lax.sort_key_val(mag, payload, dimension=1)

    # bucket b (1..half) occupies sorted range [S[b-1], S[b]) where
    # S[v-1] = first index with key >= v; S has half+1 entries (v=1..half+1)
    S = _searchsorted_batch(keys, half + 1)  # (W, half+1)
    counts = S[:, 1:] - S[:, :-1]  # (W, half)
    rounds = jnp.max(counts)
    assert L % 2 == 0
    pxy = jnp.concatenate([px, py], axis=0)  # (2L, N)
    pxy = pxy[0::2] | (pxy[1::2] << 16)  # (L, N): row k = limbs 2k | 2k+1

    from zkarray.kernels import mont as _km

    if _km.use_pallas((W, half), min_batch=4096):
        return _accum_grid(curve, packed, S, counts, pxy, state, c, scalar_bits)

    # XLA fallback: one masked (W, half)-wide mixed add per round.
    def cond(carry):
        return carry[0] < rounds

    def body(carry):
        r, st = carry
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
        st = sw.xyzz_add_affine(curve, st, AffinePoints(gx, gy, ginf))
        return r + jnp.int32(1), st

    _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return state


def _tree_sum_last(curve, P: XYZZPoints) -> XYZZPoints:
    """Pairwise tree-sum over the LAST axis (log2(B) full-width adds)."""
    m = P.x.shape[-1]
    while m > 1:
        h = m // 2
        lo = XYZZPoints(*(v[..., :h] for v in P))
        hi = XYZZPoints(*(v[..., h : 2 * h] for v in P))
        red = sw.xyzz_add(curve, lo, hi)
        if m % 2:
            red = XYZZPoints(
                *(
                    jnp.concatenate([a, v[..., 2 * h :]], axis=-1)
                    for a, v in zip(red, P)
                )
            )
            m = h + 1
        else:
            m = h
        P = red
    return P


def _weighted_sum_bits(
    curve: SWCurveSpec, state: XYZZPoints, weights: np.ndarray, quad: int = 4
) -> XYZZPoints:
    """win_w = sum_j weights[w, j] * state[:, w, j] for a HOST-CONSTANT
    weight matrix, via bit decomposition: for each weight bit k, tree-sum
    the buckets whose weight has bit k set, then bit-Horner the per-bit
    partials. All heavy adds run at full (quad*W, B/2^l) width on the
    fused kernel — this replaced a serial suffix-scan whose ~450 narrow
    sequential ops cost 790 ms per MSM (round-4 profile), independent of n.
    Reference computes the same sum serially (variable_base/mod.rs:477-484).
    """
    f = curve.base
    L = f.num_limbs
    W, B = weights.shape
    nbits = int(weights.max()).bit_length()
    parts = []  # per-bit (L, W) partials, low bit first
    for k0 in range(0, nbits, quad):
        ks = list(range(k0, min(k0 + quad, nbits)))
        q = len(ks)
        m = np.stack([(weights >> k) & 1 for k in ks]).astype(bool)  # (q, W, B)
        mj = jnp.asarray(m)
        sel = XYZZPoints(
            fp.select(mj, state.x[:, None], fp.one(f, (q, W, B))),
            fp.select(mj, state.y[:, None], fp.one(f, (q, W, B))),
            fp.select(mj, state.zz[:, None], fp.zero(f, (q, W, B))),
            fp.select(mj, state.zzz[:, None], fp.zero(f, (q, W, B))),
        )
        summed = _tree_sum_last(curve, sel)  # (L, q, W, 1) -> (L, q, W)
        summed = XYZZPoints(*(v.reshape(L, q, W) for v in summed))
        parts.extend(
            XYZZPoints(*(v[:, i] for v in summed)) for i in range(q)
        )
    # bit-Horner, high -> low: acc = 2*acc + T_k, width (W,)
    acc = parts[-1]
    for k in range(nbits - 2, -1, -1):
        acc = sw.xyzz_double(curve, acc)
        acc = sw.xyzz_add(curve, acc, parts[k])
    return acc  # coords (L, W)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def msm_reduce(
    curve: SWCurveSpec, state: XYZZPoints, c: int, scalar_bits: int
) -> XYZZPoints:
    """(W, half) bucket state -> final MSM point: weighted bucket sums via
    host-constant weight bits (split-window aware: split windows just get a
    restarting weight vector) + Horner across windows (reference
    variable_base/mod.rs:477-503)."""
    W, half, splits, _ = _window_geometry(c, scalar_bits)

    weights = np.zeros((W, half), dtype=np.uint32)
    weights[:] = np.arange(1, half + 1, dtype=np.uint32)[None, :]
    for w, v_w, K_w in splits:
        row = np.zeros(half, dtype=np.uint32)
        used = K_w * v_w
        row[:used] = (np.arange(used, dtype=np.uint32) % v_w) + 1
        weights[w] = row
    win = _weighted_sum_bits(curve, state, weights)  # coords (L, W)

    L = curve.base.num_limbs
    from zkarray.kernels import mont as _km

    if W > 1 and _km.use_pallas((1,), min_batch=1):
        # window-Horner chain in one kernel launch (kernels/sw.py): the
        # ~c*(W-1) serial width-1 doublings cost ~1 ms each as dispatched
        # XLA ops (~250 ms/MSM, size-independent) vs ~3 ms fused.
        from zkarray.kernels import sw as ksw

        rows = jnp.concatenate(list(win), axis=0)  # (4L, W)
        win_rows = jnp.broadcast_to(
            rows.T[:, :, None, None], (W, 4 * L, 1, 128)
        )
        res = ksw.horner_windows(curve, win_rows, W, c)  # (4L, 1, 128)
        return XYZZPoints(
            *(res[i * L : (i + 1) * L, 0, 0] for i in range(4))
        )

    # XLA fallback: Horner over windows, high->low
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


def msm(
    curve: SWCurveSpec,
    points: AffinePoints,
    scalars: jnp.ndarray,
    c: Optional[int] = None,
    max_scalar_bits: Optional[int] = None,
) -> XYZZPoints:
    """Sum of scalars_i * points_i. ``scalars``: canonical limbs (Ls, N).

    Returns a single XYZZ point (batch shape ()); use sw.xyzz_to_affine.
    Matches VariableBaseMSM::msm (variable_base/mod.rs:437-503) output.

    ``max_scalar_bits`` is the TPU-shaped magnitude specialization
    (reference msm_signed's +-u8/u16/... width classes,
    variable_base/mod.rs:242-347): a static bound on every scalar's bit
    length shrinks the window count W — the compiled kernel does
    proportionally less work. Use msm_mixed() for per-class dispatch of
    heterogeneous scalar batches.
    """
    n = points.x.shape[1]
    if c is None:
        c = default_window_size(n)
    scalar_bits = curve.scalar.bits
    if max_scalar_bits is not None:
        scalar_bits = min(scalar_bits, max_scalar_bits)
    W, half, _, _ = _window_geometry(c, scalar_bits)
    state = sw.xyzz_zero(curve, (W, half))
    state = msm_accumulate(curve, points, scalars, c, scalar_bits, state)
    return msm_reduce(curve, state, c, scalar_bits)


class ChunkedMSM:
    """Streaming MSM over fixed-size device chunks with carried bucket state.

    Reference analog: ChunkedPippenger (ec/src/scalar_mul/variable_base/
    stream_pippenger.rs:10-70), which flushes a full Pippenger per chunk
    and adds the partial into a running total. Here the (W, half) bucket
    array is the carried state instead, so the per-window bucket reduction
    and Horner combine are paid ONCE at the end regardless of chunk count —
    and HBM never needs to hold more than one chunk of points. This is the
    2^24-2^26 path: a 2^26 BLS12-381 G1 MSM streams 32 chunks of 2^21.

    All chunks must have the same width (pad the last one: infinity points
    / zero scalars contribute nothing).
    """

    def __init__(
        self,
        curve: SWCurveSpec,
        chunk_size: int,
        total_hint: Optional[int] = None,
        c: Optional[int] = None,
        max_scalar_bits: Optional[int] = None,
    ):
        self.curve = curve
        self.chunk_size = chunk_size
        if c is None:
            # window size follows the CHUNK size: the accumulate phase's
            # occupancy slack is per-chunk (rounds = chunk/B + tail), while
            # the bucket reduction — the only term a bigger c would shrink —
            # is paid once and is cheap after the round-4 reduce rewrite.
            c = default_window_size(chunk_size)
        self.c = c
        self.total_hint = total_hint
        bits = curve.scalar.bits
        if max_scalar_bits is not None:
            bits = min(bits, max_scalar_bits)
        self.scalar_bits = bits
        W, half, _, _ = _window_geometry(c, bits)
        self.state = sw.xyzz_zero(curve, (W, half))

    def add_chunk(self, points: AffinePoints, scalars: jnp.ndarray):
        """Accumulate one chunk (width == chunk_size; pad shorter chunks)."""
        n = points.x.shape[1]
        if n != self.chunk_size:
            if n > self.chunk_size:
                raise ValueError("chunk wider than chunk_size")
            pad = self.chunk_size - n
            L = self.curve.base.num_limbs
            points = AffinePoints(
                jnp.pad(points.x, ((0, 0), (0, pad))),
                jnp.pad(points.y, ((0, 0), (0, pad))),
                jnp.pad(points.inf, (0, pad), constant_values=True),
            )
            scalars = jnp.pad(scalars, ((0, 0), (0, pad)))
        self.state = msm_accumulate(
            self.curve, points, scalars, self.c, self.scalar_bits, self.state
        )

    def result(self) -> XYZZPoints:
        return msm_reduce(self.curve, self.state, self.c, self.scalar_bits)


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
