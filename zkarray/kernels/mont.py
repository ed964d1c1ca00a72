"""Pallas TPU kernels: Montgomery field arithmetic on planar 16-bit limbs.

Reference analog: ark-ff-asm's x86-64 CIOS codegen (ff-asm/src/lib.rs:49-120)
— the reference's mechanism for dropping the hot multiply to a lower level.
Here the whole CIOS (schoolbook product + interleaved Montgomery reduction +
conditional subtract) runs as straight-line VPU code inside one Pallas kernel,
keeping every intermediate column in VMEM/vector registers. Measured on a
TPU v5e this is ~14x the fused-XLA path (253 vs 18 Mmul/s at L=24, n=2^20):
the XLA path splits the ~600-op chain across kernel launches with HBM
round-trips; the Pallas kernel's only HBM traffic is inputs and outputs.

Layout contract: field arrays are uint32[L, N] with N a multiple of
SUBLANES*LANES = 1024; each grid step processes a (L, 8, 128) block — one
(8,128) vreg per limb row, so every unrolled limb op runs at full VPU width.

Field constants (modulus limbs, inv16) are Python ints baked into the kernel
as immediates — the trace-time analog of the reference's per-modulus
macro-expansion specialization (montgomery_backend.rs:15-125).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zkarray.core.fieldspec import FieldSpec, LIMB_BITS, LIMB_MASK

LANES = 128
SUBLANES = 8
BLOCK = SUBLANES * LANES  # batch elements per grid step

_MASK = np.uint32(LIMB_MASK)


@functools.lru_cache(maxsize=None)
def pallas_enabled() -> bool:
    """Kernel path policy: on unless ZKARRAY_PALLAS=0."""
    return os.environ.get("ZKARRAY_PALLAS", "1") != "0"


def interpret_mode() -> bool:
    """True when pallas_call must run in the Pallas interpreter: explicit
    ZKARRAY_PALLAS_INTERPRET=1, or any non-TPU backend (CPU supports
    interpret mode only) — so direct kernel calls are testable on the CPU
    suite without env plumbing."""
    if os.environ.get("ZKARRAY_PALLAS_INTERPRET", "0") == "1":
        return True
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def use_pallas(batch_shape, min_batch: int = 1024) -> bool:
    """True when the Pallas kernel path should be used for this batch.

    Decided at trace time: TPU backend (or interpreter mode for tests), the
    feature flag on, and a batch large enough to fill VPU blocks.
    """
    n = 1
    for d in batch_shape:
        n *= int(d)
    if n < min_batch or not pallas_enabled():
        return False
    if os.environ.get("ZKARRAY_PALLAS_INTERPRET", "0") == "1":
        return True  # explicit opt-in: cover kernel bodies on CPU
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# kernel bodies (shared straight-line limb routines)
# ---------------------------------------------------------------------------

def _redc(L, p_limbs, inv16, cols):
    """CIOS Montgomery reduction over a 2L+1 list of lazy columns.

    Reference: montgomery_backend.rs:234-245. Returns L canonical limb rows
    (list) after the final carry sweep and conditional subtract.
    """
    carry = jnp.zeros_like(cols[0])
    for i in range(L):
        ci = cols[i] + carry
        m = (ci * inv16) & _MASK
        for j in range(L):
            if p_limbs[j] == 0:
                continue
            pr = m * np.uint32(p_limbs[j])
            if j > 0:
                cols[i + j] = cols[i + j] + (pr & _MASK)
            cols[i + j + 1] = cols[i + j + 1] + (pr >> LIMB_BITS)
        carry = (ci + ((m * np.uint32(p_limbs[0])) & _MASK)) >> LIMB_BITS
    # carry-normalize the high half (L+1 limbs: value < 2p)
    outs = []
    c = carry
    for k in range(L + 1):
        t = cols[L + k] + c
        outs.append(t & _MASK)
        c = t >> LIMB_BITS
    return _cond_sub_p(L, p_limbs, outs)


def _cond_sub_p(L, p_limbs, r):
    """r: list of L+1 canonical limb rows, value < 2p -> value mod p (L rows)."""
    borrow = jnp.zeros_like(r[0])
    diffs = []
    for k in range(L + 1):
        pk = np.uint32(p_limbs[k]) if k < L else np.uint32(0)
        t = r[k] - pk - borrow
        diffs.append(t & _MASK)
        borrow = t >> 31
    keep_diff = borrow == 0
    return [jnp.where(keep_diff, diffs[k], r[k]) for k in range(L)]


def _mul_body(L, p_limbs, inv16, a, b):
    """Full CIOS product a*b*R^-1: a, b are (L, ...) arrays; returns L rows."""
    zero = jnp.zeros_like(a[0])
    cols = [zero] * (2 * L + 1)
    for i in range(L):
        p = a[i][None] * b  # (L, ...)
        lo = p & _MASK
        hi = p >> LIMB_BITS
        for j in range(L):
            cols[i + j] = cols[i + j] + lo[j]
            cols[i + j + 1] = cols[i + j + 1] + hi[j]
    return _redc(L, p_limbs, inv16, cols)


def _sqr_body(L, p_limbs, inv16, a):
    """Montgomery square with the symmetric (doubled off-diagonal) trick."""
    zero = jnp.zeros_like(a[0])
    cols = [zero] * (2 * L + 1)
    for i in range(L - 1):
        p = a[i][None] * a[i + 1 :]
        lo = (p & _MASK) << 1
        hi = (p >> LIMB_BITS) << 1
        for j in range(p.shape[0]):
            cols[2 * i + 1 + j] = cols[2 * i + 1 + j] + lo[j]
            cols[2 * i + 2 + j] = cols[2 * i + 2 + j] + hi[j]
    d = a * a
    dlo = d & _MASK
    dhi = d >> LIMB_BITS
    for i in range(L):
        cols[2 * i] = cols[2 * i] + dlo[i]
        cols[2 * i + 1] = cols[2 * i + 1] + dhi[i]
    return _redc(L, p_limbs, inv16, cols)


def _add_body(L, p_limbs, a, b):
    """(a + b) mod p on canonical-limb rows (both < p)."""
    outs = []
    c = jnp.zeros_like(a[0])
    for k in range(L):
        t = a[k] + b[k] + c
        outs.append(t & _MASK)
        c = t >> LIMB_BITS
    outs.append(c)
    return _cond_sub_p(L, p_limbs, outs)


def _sub_body(L, p_limbs, a, b):
    """(a - b) mod p on canonical-limb rows (both < p)."""
    borrow = jnp.zeros_like(a[0])
    diffs = []
    for k in range(L):
        t = a[k] - b[k] - borrow
        diffs.append(t & _MASK)
        borrow = t >> 31
    wrapped = borrow != 0
    out = []
    c = jnp.zeros_like(a[0])
    for k in range(L):
        t = diffs[k] + np.uint32(p_limbs[k]) + c
        out.append(jnp.where(wrapped, t & _MASK, diffs[k]))
        c = t >> LIMB_BITS
    return out


def _stack_out(o_ref, rows):
    o_ref[:] = jnp.stack(rows)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _field_consts(spec: FieldSpec):
    p = spec.modulus
    p_limbs = tuple((p >> (LIMB_BITS * i)) & LIMB_MASK for i in range(spec.num_limbs))
    return p_limbs, np.uint32(spec.inv16)


def _flatten_pad(arrs):
    """(L, *batch) arrays -> (L, nb*SUBLANES, LANES) blocks + unpad info."""
    L = arrs[0].shape[0]
    batch = arrs[0].shape[1:]
    n = int(np.prod(batch)) if batch else 1
    pad = (-n) % BLOCK
    out = []
    for a in arrs:
        f = a.reshape(L, n)
        if pad:
            f = jnp.pad(f, ((0, 0), (0, pad)))
        out.append(f.reshape(L, (n + pad) // LANES, LANES))
    return out, batch, n


def _unflatten(o, batch, n):
    L = o.shape[0]
    return o.reshape(L, -1)[:, :n].reshape((L,) + batch)


def _elementwise_call(kernel, n_in, L, blocks):
    nb = blocks[0].shape[1] // SUBLANES
    spec_ = pl.BlockSpec((L, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(blocks[0].shape, jnp.uint32),
        grid=(nb,),
        in_specs=[spec_] * n_in,
        out_specs=spec_,
        interpret=interpret_mode(),
    )(*blocks)


def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pallas CIOS Montgomery product over (L, *batch) planar limb arrays.

    Bit-identical to fp.mont_mul's XLA path (same CIOS recurrence, same
    R = 2^(16L) as arkworks; montgomery_backend.rs:179-246).
    """
    L = spec.num_limbs
    p_limbs, inv16 = _field_consts(spec)
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (L,) + batch)
    b = jnp.broadcast_to(b, (L,) + batch)
    (a3, b3), bshape, n = _flatten_pad([a, b])

    def kernel(a_ref, b_ref, o_ref):
        _stack_out(o_ref, _mul_body(L, p_limbs, inv16, a_ref[:], b_ref[:]))

    return _unflatten(_elementwise_call(kernel, 2, L, [a3, b3]), bshape, n)


def mont_sqr(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Pallas Montgomery square (montgomery_backend.rs:248-317)."""
    L = spec.num_limbs
    p_limbs, inv16 = _field_consts(spec)
    (a3,), bshape, n = _flatten_pad([a])

    def kernel(a_ref, o_ref):
        _stack_out(o_ref, _sqr_body(L, p_limbs, inv16, a_ref[:]))

    return _unflatten(_elementwise_call(kernel, 1, L, [a3]), bshape, n)


def butterfly_dit_inplace(
    spec: FieldSpec, x: jnp.ndarray, w: jnp.ndarray, C: int, H: int, R: int
):
    """One in-place radix-2 DIT butterfly stage: for every chunk c and pair
    index j, (lo, hi) = x[:, c, 0/1, j, :] -> (lo + hi·w_j, lo − hi·w_j),
    written back into the SAME buffer positions.

    This is the NTT hot loop (reference poly/src/domain/radix2/fft.rs:213-295
    butterfly ladder). The XLA path expresses each stage as slice → mul →
    add/sub → concatenate: ~2 extra full-array copies per stage plus a
    materialized broadcast of the twiddles. Here one kernel reads each
    element once and writes it once (input_output_aliases), with the
    twiddle block re-read per (c, r) tile (H·128 words, VMEM-cheap).

    x: (L, C, 2, H, R) uint32 planar limbs; w: (L, H, 128) — stage twiddles
    broadcast across lanes. Requires H % 8 == 0 and R % 128 == 0.
    """
    L = spec.num_limbs
    p_limbs, inv16 = _field_consts(spec)
    assert H % SUBLANES == 0 and R % LANES == 0

    def kernel(x_ref, w_ref, o_ref):
        lo = x_ref[:, 0, 0]  # (L, 8, 128)
        hi = x_ref[:, 0, 1]
        wv = w_ref[:]
        lo_r = [lo[i] for i in range(L)]
        t = _mul_body(L, p_limbs, inv16, hi, wv)
        s = _add_body(L, p_limbs, lo_r, t)
        d = _sub_body(L, p_limbs, lo_r, t)
        o_ref[:, 0, 0] = jnp.stack(s)
        o_ref[:, 0, 1] = jnp.stack(d)

    xspec = pl.BlockSpec(
        (L, 1, 2, SUBLANES, LANES),
        lambda c, h, r: (0, c, 0, h, r),
        memory_space=pltpu.VMEM,
    )
    wspec = pl.BlockSpec(
        (L, SUBLANES, LANES), lambda c, h, r: (0, h, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        grid=(C, H // SUBLANES, R // LANES),
        in_specs=[xspec, wspec],
        out_specs=xspec,
        input_output_aliases={0: 0},
        interpret=interpret_mode(),
    )(x, w)


def butterfly_stage(spec: FieldSpec, lo: jnp.ndarray, hi: jnp.ndarray, w: jnp.ndarray):
    """Fused radix-2 DIF butterfly: (lo, hi, w) -> (lo+hi, (lo-hi)*w).

    One kernel per stage instead of three composed field ops — the Pallas
    analog of the reference's butterfly_fn_io (poly/src/domain/radix2/
    fft.rs:190-198). Returns (a, b).
    """
    L = spec.num_limbs
    p_limbs, inv16 = _field_consts(spec)
    batch = jnp.broadcast_shapes(lo.shape[1:], hi.shape[1:], w.shape[1:])
    lo = jnp.broadcast_to(lo, (L,) + batch)
    hi = jnp.broadcast_to(hi, (L,) + batch)
    w = jnp.broadcast_to(w, (L,) + batch)
    (l3, h3, w3), bshape, n = _flatten_pad([lo, hi, w])
    nb = l3.shape[1] // SUBLANES
    spec_ = pl.BlockSpec((L, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)

    def kernel(l_ref, h_ref, w_ref, a_ref, b_ref):
        lo_v, hi_v, w_v = l_ref[:], h_ref[:], w_ref[:]
        s = _add_body(L, p_limbs, lo_v, hi_v)
        d = _sub_body(L, p_limbs, lo_v, hi_v)
        prod = _mul_body(L, p_limbs, inv16, jnp.stack(d), w_v)
        _stack_out(a_ref, s)
        _stack_out(b_ref, prod)

    a3, b3 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(l3.shape, jnp.uint32),
            jax.ShapeDtypeStruct(l3.shape, jnp.uint32),
        ),
        grid=(nb,),
        in_specs=[spec_] * 3,
        out_specs=(spec_, spec_),
        interpret=interpret_mode(),
    )(l3, h3, w3)
    return _unflatten(a3, bshape, n), _unflatten(b3, bshape, n)
