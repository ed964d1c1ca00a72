"""Pallas Montgomery-field kernels over planar 16-bit-limb uint32 arrays.

Reference analog: ark-ff-asm's generated mulx/adcx/adox CIOS assembly
(ff-asm/src/lib.rs:49-120) — the reference's only native fast path, claimed
30-70% faster than portable Rust (README.md:62). On TPU the same job is done
by emitting the CIOS schoolbook + reduction as straight-line VPU vector ops
inside one Pallas kernel, so one grid step loads a (L, BLOCK) limb tile into
VMEM, runs the whole multiply (~L^2 MACs over 16-bit limbs in uint32 lanes),
and stores the result — no intermediate HBM traffic.

Same algorithm and limb schedule as the XLA path (zkarray/ff/fp.py), so the
two paths are bit-identical. Pallas forbids capturing device-array constants,
so the modulus plane is threaded in as a broadcast kernel input.

Kernels run compiled on TPU; elsewhere (CPU tests) in interpreter mode.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from zkarray.core.fieldspec import FieldSpec
from zkarray.core.limbs import LIMB_BITS, LIMB_MASK
from zkarray.ff import fp

# Batch elements per grid step: lanes are 128 wide; 512 keeps the (L, BLOCK)
# tile + 2L+1 column accumulators comfortably inside VMEM for L <= 52
# (832-bit fields).
BLOCK = 512


def pallas_enabled() -> bool:
    """Kernels are opt-in on TPU via ZKARRAY_PALLAS=1 (bench flips this);
    the XLA SSA path is the default and is what the test oracle runs."""
    return os.environ.get("ZKARRAY_PALLAS", "0") == "1"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# raw bodies (p threaded in as a value — no captured device constants)
# ---------------------------------------------------------------------------

def _normalize(cols: list, out_limbs: int) -> jnp.ndarray:
    carry = jnp.zeros_like(cols[0])
    outs = []
    for k in range(out_limbs):
        t = (cols[k] + carry) if k < len(cols) else carry
        outs.append(t & LIMB_MASK)
        carry = t >> LIMB_BITS
    return jnp.stack(outs)


def _sub_with_borrow(a: jnp.ndarray, b: jnp.ndarray):
    borrow = jnp.zeros_like(a[0])
    outs = []
    for k in range(a.shape[0]):
        t = a[k] - b[k] - borrow
        outs.append(t & LIMB_MASK)
        borrow = t >> 31
    return jnp.stack(outs), borrow


def _reduce_cols(spec: FieldSpec, cols: list, p_col: jnp.ndarray) -> jnp.ndarray:
    """CIOS Montgomery reduction over 2L+1 lazy columns; p_col: (L, *batch).
    Reference: montgomery_backend.rs:234-245."""
    L = spec.num_limbs
    inv16 = np.uint32(spec.inv16)
    for i in range(L):
        m = (cols[i] * inv16) & LIMB_MASK
        row = m[None] * p_col
        lo = row & LIMB_MASK
        hi = row >> LIMB_BITS
        for j in range(L):
            cols[i + j] = cols[i + j] + lo[j]
            cols[i + j + 1] = cols[i + j + 1] + hi[j]
        cols[i + 1] = cols[i + 1] + (cols[i] >> LIMB_BITS)
    r = _normalize(cols[L:], L + 1)
    p_ext = jnp.concatenate([p_col, jnp.zeros_like(p_col[:1])], axis=0)
    diff, borrow = _sub_with_borrow(r, p_ext)
    return jnp.where((borrow == 0)[None], diff[:L], r[:L])


def _raw_mul(spec: FieldSpec, a, b, p_col):
    L = spec.num_limbs
    zero_col = jnp.zeros(a.shape[1:], dtype=jnp.uint32)
    cols = [zero_col] * (2 * L + 1)
    for i in range(L):
        row = a[i][None] * b
        lo = row & LIMB_MASK
        hi = row >> LIMB_BITS
        for j in range(L):
            cols[i + j] = cols[i + j] + lo[j]
            cols[i + j + 1] = cols[i + j + 1] + hi[j]
    return _reduce_cols(spec, cols, p_col)


def _raw_sqr(spec: FieldSpec, a, p_col):
    L = spec.num_limbs
    zero_col = jnp.zeros(a.shape[1:], dtype=jnp.uint32)
    cols = [zero_col] * (2 * L + 1)
    for i in range(L - 1):
        row = a[i][None] * a[i + 1 :]
        lo = (row & LIMB_MASK) << 1
        hi = (row >> LIMB_BITS) << 1
        for j in range(row.shape[0]):
            cols[2 * i + 1 + j] = cols[2 * i + 1 + j] + lo[j]
            cols[2 * i + 2 + j] = cols[2 * i + 2 + j] + hi[j]
    diag = a * a
    dlo = diag & LIMB_MASK
    dhi = diag >> LIMB_BITS
    for i in range(L):
        cols[2 * i] = cols[2 * i] + dlo[i]
        cols[2 * i + 1] = cols[2 * i + 1] + dhi[i]
    return _reduce_cols(spec, cols, p_col)


def _raw_add(spec: FieldSpec, a, b, p_col):
    L = spec.num_limbs
    s = _normalize([a[k] + b[k] for k in range(L)], L + 1)
    p_ext = jnp.concatenate([p_col, jnp.zeros_like(p_col[:1])], axis=0)
    diff, borrow = _sub_with_borrow(s, p_ext)
    return jnp.where((borrow == 0)[None], diff[:L], s[:L])


def _raw_sub(spec: FieldSpec, a, b, p_col):
    L = spec.num_limbs
    d, borrow = _sub_with_borrow(a, b)
    d_fix = _normalize([d[k] + p_col[k] for k in range(L)], L)
    return jnp.where((borrow == 0)[None], d, d_fix)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _p_block(spec: FieldSpec) -> np.ndarray:
    """(L, BLOCK) modulus plane, one block reused by every grid step."""
    p = spec.modulus
    col = np.asarray(
        [(p >> (LIMB_BITS * i)) & LIMB_MASK for i in range(spec.num_limbs)],
        dtype=np.uint32,
    )
    return np.broadcast_to(col[:, None], (spec.num_limbs, BLOCK)).copy()


def _pad_flat(a: jnp.ndarray, L: int):
    """(L, *batch) -> ((L, n_pad) array, batch_shape, n). Pads lanes to BLOCK."""
    batch = a.shape[1:]
    x = a.reshape(L, -1)
    n = x.shape[1]
    pad = (-n) % BLOCK
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x, batch, n


def _cost(spec: FieldSpec, n: int, ops: int) -> pl.CostEstimate:
    L = spec.num_limbs
    # ~2 MACs per limb pair in the schoolbook + as many again in reduction
    return pl.CostEstimate(
        flops=ops * 4 * L * L * n,
        bytes_accessed=(ops + 1) * L * n * 4,
        transcendentals=0,
    )


def _tile_spec(L):
    return pl.BlockSpec((L, BLOCK), lambda i: (0, i))


def _const_spec(L):
    return pl.BlockSpec((L, BLOCK), lambda i: (0, 0))


@functools.partial(jax.jit, static_argnums=0)
def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pallas Montgomery product a·b·R^{-1} mod p; same layout/semantics as
    fp.mont_mul (reference: montgomery_backend.rs:179-246)."""
    L = spec.num_limbs
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a2, batch, n = _pad_flat(jnp.broadcast_to(a, shape), L)
    b2, _, _ = _pad_flat(jnp.broadcast_to(b, shape), L)
    grid = a2.shape[1] // BLOCK

    def kernel(a_ref, b_ref, p_ref, o_ref):
        o_ref[:] = _raw_mul(spec, a_ref[:], b_ref[:], p_ref[:])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(a2.shape, jnp.uint32),
        grid=(grid,),
        in_specs=[_tile_spec(L), _tile_spec(L), _const_spec(L)],
        out_specs=_tile_spec(L),
        cost_estimate=_cost(spec, BLOCK, 1),
        interpret=_interpret(),
    )(a2, b2, jnp.asarray(_p_block(spec)))
    return out[:, :n].reshape((L,) + batch)


@functools.partial(jax.jit, static_argnums=0)
def mont_sqr(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Pallas Montgomery square (reference: montgomery_backend.rs:248-317)."""
    L = spec.num_limbs
    a2, batch, n = _pad_flat(a, L)
    grid = a2.shape[1] // BLOCK

    def kernel(a_ref, p_ref, o_ref):
        o_ref[:] = _raw_sqr(spec, a_ref[:], p_ref[:])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(a2.shape, jnp.uint32),
        grid=(grid,),
        in_specs=[_tile_spec(L), _const_spec(L)],
        out_specs=_tile_spec(L),
        cost_estimate=_cost(spec, BLOCK, 1),
        interpret=_interpret(),
    )(a2, jnp.asarray(_p_block(spec)))
    return out[:, :n].reshape((L,) + batch)


@functools.partial(jax.jit, static_argnums=0)
def butterfly_stage(
    spec: FieldSpec, lo: jnp.ndarray, hi: jnp.ndarray, w: jnp.ndarray
):
    """Fused radix-2 DIT butterfly: t = hi·w; returns (lo+t, lo−t).

    One kernel = one NTT stage tile: the multiply, the modular add and the
    modular sub all happen on the same VMEM-resident block (reference
    butterfly: poly/src/domain/radix2/fft.rs:190-198, one rayon task per
    chunk there; one grid step per (L, BLOCK) tile here).
    """
    L = spec.num_limbs
    shape = jnp.broadcast_shapes(lo.shape, hi.shape, w.shape)
    lo2, batch, n = _pad_flat(jnp.broadcast_to(lo, shape), L)
    hi2, _, _ = _pad_flat(jnp.broadcast_to(hi, shape), L)
    w2, _, _ = _pad_flat(jnp.broadcast_to(w, shape), L)
    grid = lo2.shape[1] // BLOCK

    def kernel(lo_ref, hi_ref, w_ref, p_ref, a_ref, b_ref):
        p_col = p_ref[:]
        t = _raw_mul(spec, hi_ref[:], w_ref[:], p_col)
        lo_v = lo_ref[:]
        a_ref[:] = _raw_add(spec, lo_v, t, p_col)
        b_ref[:] = _raw_sub(spec, lo_v, t, p_col)

    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(lo2.shape, jnp.uint32),
            jax.ShapeDtypeStruct(lo2.shape, jnp.uint32),
        ),
        grid=(grid,),
        in_specs=[_tile_spec(L), _tile_spec(L), _tile_spec(L), _const_spec(L)],
        out_specs=(_tile_spec(L), _tile_spec(L)),
        cost_estimate=_cost(spec, BLOCK, 1),
        interpret=_interpret(),
    )(lo2, hi2, w2, jnp.asarray(_p_block(spec)))
    a, b = outs
    return (
        a[:, :n].reshape((L,) + batch),
        b[:, :n].reshape((L,) + batch),
    )
