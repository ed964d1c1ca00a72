"""Round-5 lab: microbench the presorted round-loop's constituent ops on
the real TPU — slice-gather (vmap dynamic_slice), layout transpose, and the
accumulation kernel — to find where the 2^18 regression lives.

Run: python scratch/r5_msm_ops.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from zkarray.jaxcache import setup_cache

setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.curves import bls12_381
from zkarray.kernels import sw as ksw


def sync(x):
    np.asarray(x.reshape(-1)[:1])


def timeit(f, n=5):
    r = f()
    sync(r if isinstance(r, jnp.ndarray) else jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    sync(r if isinstance(r, jnp.ndarray) else jax.tree_util.tree_leaves(r)[0])
    return (time.perf_counter() - t0) / n


def main():
    curve = bls12_381.G1
    L = 24
    T = 16
    W, half = 20, 4096
    WBp = W * half  # 81920
    nb = WBp // 1024
    N = 1 << 18
    R = W * N + T
    rng = np.random.default_rng(0)

    rows = jnp.asarray(rng.integers(0, 1 << 32, size=(R, L), dtype=np.uint32))
    starts = jnp.asarray(rng.integers(0, W * N, size=(WBp,), dtype=np.int32))

    @jax.jit
    def slice_gather(rows, starts):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(rows, (s, jnp.int32(0)), (T, L))
        )(starts)

    t = timeit(lambda: slice_gather(rows, starts))
    print(f"slice-gather {WBp} x ({T},{L}): {t*1e3:.2f} ms "
          f"({t/WBp*1e9:.1f} ns/idx, {WBp*T*L*4/t/1e9:.0f} GB/s)")

    sl = slice_gather(rows, starts)  # (WBp, T, L)

    @jax.jit
    def do_transpose(sl):
        return (
            sl.reshape(nb, 1024, T, L)
            .transpose(0, 2, 3, 1)
            .reshape(nb, T * L, 8, 128)
        )

    t = timeit(lambda: do_transpose(sl))
    print(f"transpose to kernel layout: {t*1e3:.2f} ms "
          f"({sl.size*4*2/t/1e9:.0f} GB/s eff)")

    # plain flat row gather for comparison (one row per index)
    flat_idx = jnp.asarray(
        rng.integers(0, W * N, size=(WBp * T,), dtype=np.int32)
    )

    @jax.jit
    def row_gather(rows, idx):
        return rows[idx]

    t = timeit(lambda: row_gather(rows, flat_idx))
    print(f"flat row-gather {WBp*T} x (,{L}): {t*1e3:.2f} ms "
          f"({t/(WBp*T)*1e9:.1f} ns/idx)")

    # limb-major gather (round-4 style) for comparison
    pxy = jnp.asarray(rng.integers(0, 1 << 32, size=(L, N), dtype=np.uint32))
    cidx = jnp.asarray(rng.integers(0, N, size=(WBp * T,), dtype=np.int32))

    @jax.jit
    def limb_gather(pxy, cidx):
        return pxy[:, cidx]

    t = timeit(lambda: limb_gather(pxy, cidx))
    print(f"limb-major gather {WBp*T} idx x {L} rows: {t*1e3:.2f} ms "
          f"({t/(WBp*T)*1e9:.1f} ns/idx)")

    # accumulation kernel alone
    state = jnp.asarray(
        rng.integers(0, 1 << 32, size=(nb, 2 * L, 8, 128), dtype=np.uint32)
    )
    coords = jnp.asarray(
        rng.integers(0, 1 << 32, size=(nb, T * L, 8, 128), dtype=np.uint32)
    )
    valid = jnp.asarray(
        np.ones((nb, T, 8, 128), dtype=np.int32)
    )

    @jax.jit
    def kern(state, coords, valid):
        return ksw.xyzz_accum_tiles(curve, state, coords, valid, T)

    t = timeit(lambda: kern(state, coords, valid))
    adds = nb * 1024 * T
    print(f"accum kernel {nb} blocks x {T} rounds: {t*1e3:.2f} ms "
          f"({t/adds*1e9:.1f} ns/add)")


if __name__ == "__main__":
    main()


def more():
    """Second round: payload-row gather rates at realistic index counts and
    raw lax.gather slice variants."""
    L, T = 24, 16
    N = 1 << 20
    W = 20
    rng = np.random.default_rng(1)
    payload = jnp.asarray(
        rng.integers(0, 1 << 30, size=(W * N,), dtype=np.int32)
    )
    pxy = jnp.asarray(rng.integers(0, 1 << 32, size=(L, 2 * N), dtype=np.uint32))

    for cnt in (1 << 23, 27 << 20):
        idx = jnp.asarray(rng.integers(0, W * N, size=(cnt,), dtype=np.int32))

        @jax.jit
        def pay(payload, idx):
            return payload[idx]

        t = timeit(lambda: pay(payload, idx))
        print(f"payload 4B-row gather {cnt} idx: {t*1e3:.2f} ms ({t/cnt*1e9:.1f} ns/idx)")

        idx2 = jnp.asarray(rng.integers(0, 2 * N, size=(cnt,), dtype=np.int32))

        @jax.jit
        def coords(pxy, idx2):
            return pxy[:, idx2]

        t = timeit(lambda: coords(pxy, idx2))
        print(f"limb-major 24-row gather {cnt} idx: {t*1e3:.2f} ms ({t/cnt*1e9:.1f} ns/idx)")

    # raw lax.gather with (T, L) slices from a point-major operand
    R = W * N
    rows = jnp.asarray(rng.integers(0, 1 << 32, size=(R + T, L), dtype=np.uint32))
    WBp = 81920
    starts = jnp.asarray(rng.integers(0, R, size=(WBp, 1), dtype=np.int32))
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0,))

    @jax.jit
    def slice_gather_raw(rows, starts):
        return jax.lax.gather(
            rows, starts, dnums, slice_sizes=(T, L),
            mode=jax.lax.GatherScatterMode.CLIP)

    t = timeit(lambda: slice_gather_raw(rows, starts))
    print(f"raw lax.gather (T,L) slices {WBp} idx: {t*1e3:.2f} ms "
          f"({t/WBp*1e9:.1f} ns/slice, {t/(WBp*T)*1e9:.2f} ns/row)")


if __name__ == "__main__":
    main() if os.environ.get("ZKARRAY_OPS_PART", "1") == "1" else more()
