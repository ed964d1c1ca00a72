"""Multi-chip NTT: four-step (Bailey) decomposition with all_to_all stage
exchange over ICI/DCN.

Reference analog: the rayon-parallel butterfly stages of
poly/src/domain/radix2/fft.rs:131-250 (SURVEY.md §2.7 #4, §5.7). Cross-shard
butterfly stages become matrix transposes: local FFT over n1, twiddle,
transpose (all_to_all), local FFT over n2, final transpose back to natural
order. Input and output are flat (L, n) arrays contiguously sharded on the
element axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zkarray.core.fieldspec import FieldSpec
from zkarray.ff import fp
from zkarray.poly.domain import _fft_core, power_table


def fft_fourstep(
    spec: FieldSpec, x: jnp.ndarray, n1: int, n2: int, w_int: int,
    scale_int: Optional[int] = None,
) -> jnp.ndarray:
    """Single-device four-step NTT (oracle for the sharded version).

    x: (L, n) flat, i = i1*n2 + i2. Returns (L, n) natural order.
    Delegates to poly.domain.fft_fourstep_core (gather-free twiddle build).
    """
    from zkarray.poly.domain import fft_fourstep_core

    return fft_fourstep_core(spec, x, n1, n2, w_int, scale_int)


def fft_sharded(
    spec: FieldSpec,
    x: jnp.ndarray,
    mesh: Mesh,
    w_int: int,
    n1: Optional[int] = None,
    axis: str = "shards",
    scale_int: Optional[int] = None,
) -> jnp.ndarray:
    """Sharded four-step NTT over ``mesh``: x (L, n) flat, element axis
    contiguously sharded; output (L, n) natural order, same sharding.

    Requires n1 % D == 0, n2 % D == 0 (D = mesh size). Twiddles are computed
    per shard (no replicated n-sized table): column base w^{i2} via a local
    power table shifted by the shard offset, then log-depth powering over k1.
    """
    L = x.shape[0]
    n = x.shape[1]
    D = mesh.shape[axis]
    p = spec.modulus
    if n1 is None:
        n1 = 1 << ((n.bit_length() - 1) // 2)
        while n1 % D:
            n1 *= 2
    n2 = n // n1
    if n1 * n2 != n or n1 % D or n2 % D:
        raise ValueError(f"need n1·n2 = n with D | n1 and D | n2 (n1={n1}, n2={n2}, D={D})")

    w_n1 = pow(w_int, n2, p)  # n1-th root
    w_n2 = pow(w_int, n1, p)  # n2-th root

    x = jax.device_put(x, NamedSharding(mesh, P(None, axis)))

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P(None, axis),
        out_specs=P(None, axis), check_vma=False,
    )
    def _ntt(x_loc):
        # x_loc: (L, n/D) flat slice = (n1/D, n2) rows
        me = jax.lax.axis_index(axis)
        A = x_loc.reshape(L, n1 // D, n2)
        # transpose so i1 is fully local: (L, n1, n2/D)
        A = jax.lax.all_to_all(A, axis, split_axis=2, concat_axis=1, tiled=True)
        B = _fft_core(spec, A, n1, w_n1, None)
        # local twiddle T[k1, j] = w^{k1·(off + j)}, off = me·(n2/D):
        # base_j = w^off · w^j, then T[k1] = base^{k1} by log-depth doubling.
        base_local = power_table(spec, w_int, n2 // D)  # w^j
        w_off = fp.pow_u32(
            spec, fp.const_array(spec, w_int, (1,)), me * (n2 // D)
        )
        base = fp.mont_mul(spec, base_local, w_off)  # (L, n2/D)
        # powers over k1: T[k1] = base^{k1} — log-depth doubling with a
        # vector base: T_{2m} = [T_m, T_m · base^m], base^m by squaring.
        T = fp.one(spec, (1, n2 // D))
        bpow = base[:, None, :]  # base^(2^j)
        for _ in range(n1.bit_length() - 1):
            T = jnp.concatenate([T, fp.mont_mul(spec, T, bpow)], axis=1)
            bpow = fp.mont_sqr(spec, bpow)
        C = fp.mont_mul(spec, B, T)
        # transpose: shard k1, gather i2 → (L, n1/D, n2)
        C = jax.lax.all_to_all(C, axis, split_axis=1, concat_axis=2, tiled=True)
        # _fft_core transforms axis 1, so put i2 there: (L, n2, n1/D)
        Ct = C.transpose(0, 2, 1)
        E = _fft_core(spec, Ct, n2, w_n2, scale_int)  # (L, n2, n1/D) = [k2, k1_loc]
        # natural order k = k2·n1 + k1: shard k2, gather k1 → (L, n2/D, n1)
        E = jax.lax.all_to_all(E, axis, split_axis=1, concat_axis=2, tiled=True)
        return E.reshape(L, n // D)

    return _ntt(x)
