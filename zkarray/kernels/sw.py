"""Pallas TPU kernels: fused short-Weierstrass XYZZ point operations.

Reference analog: ark-ec's Bucket (extended Jacobian XYZZ) arithmetic
(ec/src/models/short_weierstrass/bucket.rs) — the MSM bucket-accumulation
inner loop. One kernel evaluates the ENTIRE mixed-add formula (plus the
branchless doubling/identity edge candidates) over a (L, 8, 128) block:
~17 field multiplies that would otherwise be 17 pallas_calls (or hundreds of
XLA fusions) with HBM round-trips between them run back-to-back in VMEM.

Formulas: mmadd-xyzz / add-2008-s / mdbl-2008-s-1 (EFD), matching
zkarray/ec/sw.py's XLA path bit-for-bit including edge-case selects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zkarray.core.fieldspec import LIMB_BITS, LIMB_MASK
from zkarray.kernels import mont as km


def _rows(a):
    """(L, ...) array -> list of L rows."""
    return [a[i] for i in range(a.shape[0])]


def _is_zero(rows):
    acc = rows[0]
    for r in rows[1:]:
        acc = acc | r
    return acc == 0


def _sel(mask, a_rows, b_rows):
    return [jnp.where(mask, x, y) for x, y in zip(a_rows, b_rows)]


def _consts(curve):
    """(p_limbs, inv16, one_m, a_limbs) trace-time immediates for a curve."""
    from zkarray.ff import fp as _fp

    f = curve.base
    L = f.num_limbs
    p_limbs, inv16 = km._field_consts(f)
    one_m = tuple(int(v) for v in np.asarray(_fp._np_const(f, "one")))
    a_limbs = None
    if not curve.a_is_zero:
        am = f.to_mont_int(curve.a_int)
        a_limbs = tuple((am >> (LIMB_BITS * i)) & LIMB_MASK for i in range(L))
    return p_limbs, inv16, one_m, a_limbs


def _madd_core(L, p_limbs, inv16, one_m, a_limbs, st, AX, AY, a_inf,
               lazy_dbl=False):
    """One fused XYZZ += affine step on limb-row lists (mmadd-xyzz +
    branchless mdbl-2008-s-1 / identity edges). ``st`` = (X1, Y1, ZZ1, ZZZ1)
    row lists; returns the new row lists. Shared by the elementwise kernel
    and the MSM tile-accumulation kernel.

    ``lazy_dbl``: compute the doubling-edge candidate under a BLOCK-level
    lax.cond — in MSM bucket accumulation the P == A case needs a duplicate
    point meeting its own bucket singleton, so almost every block skips the
    ~6 extra mul-equivalents (measured: the dense candidate was 25% of the
    accumulation kernel's 24 ns/add)."""
    mul = lambda u, v: km._mul_body(L, p_limbs, inv16, jnp.stack(u), jnp.stack(v))
    sqr = lambda u: km._sqr_body(L, p_limbs, inv16, jnp.stack(u))
    add = lambda u, v: km._add_body(L, p_limbs, u, v)
    sub = lambda u, v: km._sub_body(L, p_limbs, u, v)

    X1, Y1, ZZ1, ZZZ1 = st

    U2 = mul(AX, ZZ1)
    S2 = mul(AY, ZZZ1)
    Pp = sub(U2, X1)
    R = sub(S2, Y1)
    PP = sqr(Pp)
    PPP = mul(Pp, PP)
    Q = mul(X1, PP)
    X3 = sub(sub(sqr(R), PPP), add(Q, Q))
    Y3 = sub(mul(R, sub(Q, X3)), mul(Y1, PPP))
    ZZ3 = mul(ZZ1, PP)
    ZZZ3 = mul(ZZZ1, PPP)

    p0 = _is_zero(Pp)
    r0 = _is_zero(R)
    p_inf = _is_zero(ZZ1)
    both = ~p_inf & ~a_inf

    is_dbl = both & p0 & r0
    is_cancel = both & p0 & ~r0

    zero = [jnp.zeros_like(AX[0])] * L
    one = [jnp.full_like(AX[0], np.uint32(l)) for l in one_m]

    def dbl_candidate(_):
        # doubling edge candidate (mdbl-2008-s-1)
        U = add(AY, AY)
        V = sqr(U)
        Wr = mul(U, V)
        S = mul(AX, V)
        XX = sqr(AX)
        M = add(add(XX, XX), XX)
        if a_limbs is not None:
            M = add(M, [jnp.full_like(AX[0], np.uint32(l)) for l in a_limbs])
        X3d = sub(sqr(M), add(S, S))
        Y3d = sub(mul(M, sub(S, X3d)), mul(Wr, AY))
        dbl_bad = a_inf | _is_zero(AY)
        return (
            tuple(_sel(dbl_bad, one, X3d)),
            tuple(_sel(dbl_bad, one, Y3d)),
            tuple(_sel(dbl_bad, zero, V)),
            tuple(_sel(dbl_bad, zero, Wr)),
        )

    if lazy_dbl:
        Xd, Yd, ZZd, ZZZd = jax.lax.cond(
            jnp.any(is_dbl),
            dbl_candidate,
            lambda _: (tuple(one), tuple(one), tuple(zero), tuple(zero)),
            None,
        )
        Xd, Yd, ZZd, ZZZd = list(Xd), list(Yd), list(ZZd), list(ZZZd)
    else:
        Xd, Yd, ZZd, ZZZd = dbl_candidate(None)

    X3 = _sel(is_dbl, Xd, X3)
    Y3 = _sel(is_dbl, Yd, Y3)
    ZZ3 = _sel(is_dbl, ZZd, ZZ3)
    ZZZ3 = _sel(is_dbl, ZZZd, ZZZ3)

    X3 = _sel(is_cancel, one, X3)
    Y3 = _sel(is_cancel, one, Y3)
    ZZ3 = _sel(is_cancel, zero, ZZ3)
    ZZZ3 = _sel(is_cancel, zero, ZZZ3)

    # P at infinity -> affine point lifted (zz = zzz = 1 or 0 if A inf)
    one_or_zero = _sel(a_inf, zero, one)
    X3 = _sel(p_inf, AX, X3)
    Y3 = _sel(p_inf, AY, Y3)
    ZZ3 = _sel(p_inf, one_or_zero, ZZ3)
    ZZZ3 = _sel(p_inf, one_or_zero, ZZZ3)

    # A at infinity -> P unchanged
    X3 = _sel(a_inf, X1, X3)
    Y3 = _sel(a_inf, Y1, Y3)
    ZZ3 = _sel(a_inf, ZZ1, ZZ3)
    ZZZ3 = _sel(a_inf, ZZZ1, ZZZ3)
    return X3, Y3, ZZ3, ZZZ3


def xyzz_add_affine(curve, P, A):
    """Fused bucket += affine (mmadd-xyzz w/ branchless edges), Pallas path.

    P: XYZZPoints coords (L, *batch); A: AffinePoints. Bit-identical to
    sw.xyzz_add_affine's XLA path.
    """
    from zkarray.ec.sw import XYZZPoints

    f = curve.base
    L = f.num_limbs
    p_limbs, inv16, one_m, a_limbs = _consts(curve)

    batch = P.x.shape[1:]
    (x1, y1, zz1, zzz1, ax, ay), bshape, n = km._flatten_pad(
        [P.x, P.y, P.zz, P.zzz, A.x, A.y]
    )
    (ainf_b,), _, _ = km._flatten_pad([A.inf.astype(jnp.uint32)[None]])
    nb = x1.shape[1] // km.SUBLANES

    def kernel(x1r, y1r, zz1r, zzz1r, axr, ayr, infr, ox, oy, ozz, ozzz):
        st = (_rows(x1r[:]), _rows(y1r[:]), _rows(zz1r[:]), _rows(zzz1r[:]))
        AX, AY = _rows(axr[:]), _rows(ayr[:])
        a_inf = infr[0] != 0
        X3, Y3, ZZ3, ZZZ3 = _madd_core(
            L, p_limbs, inv16, one_m, a_limbs, st, AX, AY, a_inf
        )
        km._stack_out(ox, X3)
        km._stack_out(oy, Y3)
        km._stack_out(ozz, ZZ3)
        km._stack_out(ozzz, ZZZ3)

    bspec = pl.BlockSpec(
        (L, km.SUBLANES, km.LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    ispec = pl.BlockSpec(
        (1, km.SUBLANES, km.LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    shp = jax.ShapeDtypeStruct(x1.shape, jnp.uint32)
    ox, oy, ozz, ozzz = pl.pallas_call(
        kernel,
        out_shape=(shp, shp, shp, shp),
        grid=(nb,),
        in_specs=[bspec] * 6 + [ispec],
        out_specs=(bspec, bspec, bspec, bspec),
        interpret=km.interpret_mode(),
    )(x1, y1, zz1, zzz1, ax, ay, ainf_b)
    return XYZZPoints(
        km._unflatten(ox, bshape, n),
        km._unflatten(oy, bshape, n),
        km._unflatten(ozz, bshape, n),
        km._unflatten(ozzz, bshape, n),
    )


# ---------------------------------------------------------------------------
# MSM tile accumulation: T bucket rounds per kernel invocation
# ---------------------------------------------------------------------------

def xyzz_accum_tiles(curve, state, coords, valid, T: int):
    """Run T sequential bucket rounds inside ONE kernel launch.

    The reference's MSM inner loop adds each point into its bucket serially
    (ec/src/scalar_mul/variable_base/mod.rs:464-475). The aligned-rounds MSM
    turns that into dense (W·B)-wide mixed adds; this kernel additionally
    keeps the bucket state RESIDENT IN VMEM across T rounds, so per-round
    HBM traffic is one streamed point block instead of read+write of the
    whole bucket array, and per-round dispatch cost vanishes (measured
    round 4: the XLA per-round path spent ~9 ms/round in gather+dispatch
    against 1.6 ms of add compute).

    This is the DYNAMIC-round variant used by the residual loop (and any
    traced caller that cannot use the static-bound grid sweep); the bulk
    of the work runs in xyzz_accum_grid.

    state:  (nb, 2L, 8, 128) uint32 — X‖Y‖ZZ‖ZZZ, 16-bit limb PAIRS packed
            into u32 words (L//2 words per coordinate), 1024 buckets/block.
    coords: (nb, T·L, 8, 128) uint32 — per round r, rows [r·L, r·L+L) are
            the affine x‖y packed words of the point entering each bucket.
    valid:  (nb, T, 8, 128) int32 vwords — bit0: slot has a point this
            round (zero ⇒ identity add); bit1: negate y (digit sign).
    Returns the updated state (aliased with the input buffer).
    """
    f = curve.base
    L = f.num_limbs
    assert L % 2 == 0
    Lp = L // 2
    p_limbs, inv16, one_m, a_limbs = _consts(curve)
    nb = state.shape[0]

    def unpack(w):
        rows = []
        for i in range(w.shape[0]):
            rows.append(w[i] & np.uint32(0xFFFF))
            rows.append(w[i] >> LIMB_BITS)
        return rows

    def pack(rows):
        return jnp.stack(
            [rows[2 * i] | (rows[2 * i + 1] << LIMB_BITS) for i in range(len(rows) // 2)]
        )

    def kernel(st_ref, cd_ref, pk_ref, out_ref):
        stw = st_ref[0]  # (2L, 8, 128)
        X = unpack(stw[0 * Lp : 1 * Lp])
        Y = unpack(stw[1 * Lp : 2 * Lp])
        ZZ = unpack(stw[2 * Lp : 3 * Lp])
        ZZZ = unpack(stw[3 * Lp : 4 * Lp])

        def body(r, st):
            cd = cd_ref[0, pl.ds(r * L, L)]  # (L, 8, 128)
            pkv = pk_ref[0, r]  # (8, 128) int32
            AX = unpack(cd[:Lp])
            AY = unpack(cd[Lp:])
            a_inf = (pkv & 1) == 0
            sign = ((pkv >> 1) & 1) != 0
            zero = [jnp.zeros_like(AX[0])] * L
            AYn = km._sub_body(L, p_limbs, zero, AY)  # (p - y) mod p
            AY = _sel(sign, AYn, AY)
            X3, Y3, ZZ3, ZZZ3 = _madd_core(
                L, p_limbs, inv16, one_m, a_limbs, st, AX, AY, a_inf,
                lazy_dbl=True,
            )
            return tuple(X3), tuple(Y3), tuple(ZZ3), tuple(ZZZ3)

        X, Y, ZZ, ZZZ = jax.lax.fori_loop(
            0, T, body, (tuple(X), tuple(Y), tuple(ZZ), tuple(ZZZ))
        )
        out_ref[0] = jnp.concatenate(
            [pack(list(X)), pack(list(Y)), pack(list(ZZ)), pack(list(ZZZ))]
        )

    st_spec = pl.BlockSpec(
        (1, 2 * L, km.SUBLANES, km.LANES), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    cd_spec = pl.BlockSpec(
        (1, T * L, km.SUBLANES, km.LANES), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    pk_spec = pl.BlockSpec(
        (1, T, km.SUBLANES, km.LANES), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(state.shape, jnp.uint32),
        grid=(nb,),
        in_specs=[st_spec, cd_spec, pk_spec],
        out_specs=st_spec,
        input_output_aliases={0: 0},
        interpret=km.interpret_mode(),
    )(state, coords, valid)


def xyzz_accum_grid(curve, state, coords, valid, T: int):
    """The ENTIRE bucket-accumulation sweep in ONE pallas_call.

    Grid (nb, rounds/T) with the round axis minor: each bucket block stays
    RESIDENT IN VMEM across all its round steps (revisited output block),
    so there are zero per-launch XLA dispatches, state round-trips, or
    dynamic slices — the round loop is pure grid iteration. The feed is the
    padded presorted layout built by ec/msm.py::_accum_grid (one hoisted
    payload gather + one hoisted coordinate gather for the whole MSM).

    state:  (nb, 2L, 8, 128) uint32 packed X‖Y‖ZZ‖ZZZ bucket blocks.
    coords: (L, R, nb, 8, 128) uint32 — round r's points for each bucket at
            [:, r, b]; R = rounds padded to a multiple of T.
    valid:  (R, nb, 8, 128) int32 vwords — bit0: slot has a point that
            round; bit1: negate y (digit sign).
    """
    f = curve.base
    L = f.num_limbs
    assert L % 2 == 0
    Lp = L // 2
    p_limbs, inv16, one_m, a_limbs = _consts(curve)
    nb = state.shape[0]
    R = coords.shape[1]
    assert R % T == 0 and valid.shape[0] == R
    nj = R // T

    def unpack(w):
        rows = []
        for i in range(w.shape[0]):
            rows.append(w[i] & np.uint32(0xFFFF))
            rows.append(w[i] >> LIMB_BITS)
        return rows

    def pack(rows):
        return jnp.stack(
            [rows[2 * i] | (rows[2 * i + 1] << LIMB_BITS) for i in range(len(rows) // 2)]
        )

    def kernel(st_ref, cd_ref, vd_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = st_ref[:]

        stw = out_ref[0]  # (2L, 8, 128) — VMEM-resident across j steps
        X = unpack(stw[0 * Lp : 1 * Lp])
        Y = unpack(stw[1 * Lp : 2 * Lp])
        ZZ = unpack(stw[2 * Lp : 3 * Lp])
        ZZZ = unpack(stw[3 * Lp : 4 * Lp])

        def body(r, st):
            cd = cd_ref[:, r, 0]  # (L, 8, 128)
            pkv = vd_ref[r, 0]  # (8, 128) vword
            a_inf = (pkv & 1) == 0
            sign = ((pkv >> 1) & 1) != 0
            AX = unpack(cd[:Lp])
            AY = unpack(cd[Lp:])
            zero = [jnp.zeros_like(AX[0])] * L
            AYn = km._sub_body(L, p_limbs, zero, AY)  # (p - y) mod p
            AY = _sel(sign, AYn, AY)
            X3, Y3, ZZ3, ZZZ3 = _madd_core(
                L, p_limbs, inv16, one_m, a_limbs, st, AX, AY, a_inf,
                lazy_dbl=True,
            )
            return tuple(X3), tuple(Y3), tuple(ZZ3), tuple(ZZZ3)

        X, Y, ZZ, ZZZ = jax.lax.fori_loop(
            0, T, body, (tuple(X), tuple(Y), tuple(ZZ), tuple(ZZZ))
        )
        out_ref[0] = jnp.concatenate(
            [pack(list(X)), pack(list(Y)), pack(list(ZZ)), pack(list(ZZZ))]
        )

    st_spec = pl.BlockSpec(
        (1, 2 * L, km.SUBLANES, km.LANES), lambda i, j: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    cd_spec = pl.BlockSpec(
        (L, T, 1, km.SUBLANES, km.LANES), lambda i, j: (0, j, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    vd_spec = pl.BlockSpec(
        (T, 1, km.SUBLANES, km.LANES), lambda i, j: (j, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(state.shape, jnp.uint32),
        grid=(nb, nj),
        in_specs=[st_spec, cd_spec, vd_spec],
        out_specs=st_spec,
        interpret=km.interpret_mode(),
    )(state, coords, valid)


# ---------------------------------------------------------------------------
# MSM finisher: bit-Horner + window-Horner chain in ONE kernel launch
# ---------------------------------------------------------------------------

def _dbl_core(L, p_limbs, inv16, one_m, a_limbs, st):
    """Full XYZZ doubling (dbl-2008-s-1), edge-complete: infinity or
    y == 0 -> infinity. Mirrors sw.xyzz_double bit-for-bit."""
    mul = lambda u, v: km._mul_body(L, p_limbs, inv16, jnp.stack(u), jnp.stack(v))
    sqr = lambda u: km._sqr_body(L, p_limbs, inv16, jnp.stack(u))
    add = lambda u, v: km._add_body(L, p_limbs, u, v)
    sub = lambda u, v: km._sub_body(L, p_limbs, u, v)

    X1, Y1, ZZ1, ZZZ1 = st
    U = add(Y1, Y1)
    V = sqr(U)
    Wr = mul(U, V)
    S = mul(X1, V)
    XX = sqr(X1)
    M = add(add(XX, XX), XX)
    if a_limbs is not None:
        a_rows = [jnp.full_like(X1[0], np.uint32(l)) for l in a_limbs]
        M = add(M, mul(a_rows, sqr(ZZ1)))
    X3 = sub(sqr(M), add(S, S))
    Y3 = sub(mul(M, sub(S, X3)), mul(Wr, Y1))
    ZZ3 = mul(V, ZZ1)
    ZZZ3 = mul(Wr, ZZZ1)
    bad = _is_zero(ZZ1) | _is_zero(Y1)
    zero = [jnp.zeros_like(X1[0])] * L
    one = [jnp.full_like(X1[0], np.uint32(l)) for l in one_m]
    return (
        _sel(bad, one, X3),
        _sel(bad, one, Y3),
        _sel(bad, zero, ZZ3),
        _sel(bad, zero, ZZZ3),
    )


def _fadd_core(L, p_limbs, inv16, one_m, a_limbs, st, st2):
    """Full XYZZ + XYZZ (add-2008-s), edge-complete (doubling, cancel,
    either infinity). Mirrors sw.xyzz_add bit-for-bit."""
    mul = lambda u, v: km._mul_body(L, p_limbs, inv16, jnp.stack(u), jnp.stack(v))
    sqr = lambda u: km._sqr_body(L, p_limbs, inv16, jnp.stack(u))
    add = lambda u, v: km._add_body(L, p_limbs, u, v)
    sub = lambda u, v: km._sub_body(L, p_limbs, u, v)

    X1, Y1, ZZ1, ZZZ1 = st
    X2, Y2, ZZ2, ZZZ2 = st2
    U1 = mul(X1, ZZ2)
    U2 = mul(X2, ZZ1)
    S1 = mul(Y1, ZZZ2)
    S2 = mul(Y2, ZZZ1)
    Pp = sub(U2, U1)
    R = sub(S2, S1)
    PP = sqr(Pp)
    PPP = mul(Pp, PP)
    Q = mul(U1, PP)
    X3 = sub(sub(sqr(R), PPP), add(Q, Q))
    Y3 = sub(mul(R, sub(Q, X3)), mul(S1, PPP))
    ZZ3 = mul(mul(ZZ1, ZZ2), PP)
    ZZZ3 = mul(mul(ZZZ1, ZZZ2), PPP)

    p0 = _is_zero(Pp)
    r0 = _is_zero(R)
    p_inf = _is_zero(ZZ1)
    q_inf = _is_zero(ZZ2)
    both = ~p_inf & ~q_inf

    dX, dY, dZZ, dZZZ = _dbl_core(L, p_limbs, inv16, one_m, a_limbs, st)
    zero = [jnp.zeros_like(X1[0])] * L
    one = [jnp.full_like(X1[0], np.uint32(l)) for l in one_m]

    is_dbl = both & p0 & r0
    is_cancel = both & p0 & ~r0
    X3 = _sel(is_dbl, dX, X3)
    Y3 = _sel(is_dbl, dY, Y3)
    ZZ3 = _sel(is_dbl, dZZ, ZZ3)
    ZZZ3 = _sel(is_dbl, dZZZ, ZZZ3)
    X3 = _sel(is_cancel, one, X3)
    Y3 = _sel(is_cancel, one, Y3)
    ZZ3 = _sel(is_cancel, zero, ZZ3)
    ZZZ3 = _sel(is_cancel, zero, ZZZ3)
    X3 = _sel(p_inf, X2, X3)
    Y3 = _sel(p_inf, Y2, Y3)
    ZZ3 = _sel(p_inf, ZZ2, ZZ3)
    ZZZ3 = _sel(p_inf, ZZZ2, ZZZ3)
    X3 = _sel(q_inf, X1, X3)
    Y3 = _sel(q_inf, Y1, Y3)
    ZZ3 = _sel(q_inf, ZZ1, ZZ3)
    ZZZ3 = _sel(q_inf, ZZZ1, ZZZ3)
    return X3, Y3, ZZ3, ZZZ3


def horner_windows(curve, win_rows, W: int, c: int):
    """total = sum_w 2^(c*w) * win_w in ONE kernel launch.

    The window-Horner tail is inherently serial (~c*(W-1) doublings — the
    reference walks it serially too, variable_base/mod.rs:496-503); on the
    XLA path each width-1 double was a dispatched scan (~1 ms each,
    ~250 ms/MSM regardless of n). Here the whole chain runs in-VMEM:
    measured ~3 ms.

    win_rows: (W, 4L, 1, 128) uint32 — window w's X||Y||ZZ||ZZZ limb rows,
    each replicated across lanes. Returns (4L, 1, 128); lane 0 holds the
    result limbs.
    """
    f = curve.base
    L = f.num_limbs
    p_limbs, inv16, one_m, a_limbs = _consts(curve)

    def kernel(w_ref, o_ref):
        top = w_ref[W - 1]  # (4L, 1, 128)
        st = tuple(
            tuple(top[i * L + k] for k in range(L)) for i in range(4)
        )

        def outer(wi, st):
            def dbl(_, s):
                return tuple(
                    tuple(r for r in rows)
                    for rows in _dbl_core(L, p_limbs, inv16, one_m, a_limbs, s)
                )

            st = jax.lax.fori_loop(0, c, dbl, st)
            nxt = w_ref[W - 2 - wi]
            st2 = tuple(
                tuple(nxt[i * L + k] for k in range(L)) for i in range(4)
            )
            out = _fadd_core(L, p_limbs, inv16, one_m, a_limbs, st, st2)
            return tuple(tuple(r for r in rows) for rows in out)

        st = jax.lax.fori_loop(0, W - 1, outer, st)
        for i in range(4):
            for k in range(L):
                o_ref[i * L + k] = st[i][k]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4 * L, 1, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=km.interpret_mode(),
    )(win_rows)
