"""Round-5 lab: per-phase timing of the presorted MSM path on the real TPU.

Phases: (1) digits+sort+searchsorted, (2) materialize sorted rows (gather +
sign bake), (3) round loop (slice-gather + accumulation kernel), (4) reduce.
Run: python scratch/r5_msm_phases.py [log_n] [c]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from zkarray.jaxcache import setup_cache

setup_cache()

import functools
import jax
import jax.numpy as jnp
import numpy as np

from zkarray.curves import bls12_381
from zkarray.ec import msm as M, sw
from zkarray.ec.sw import AffinePoints, XYZZPoints
from zkarray.ff import fp


def sync(*xs):
    # tiny device->host copy only: a full-array copy through the axon
    # tunnel costs seconds and would pollute every phase time
    for x in xs:
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.reshape(-1)[:1])


def timeit(f, n=3):
    f()  # compile/warm
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    sync(r)
    return (time.perf_counter() - t0) / n


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    curve = bls12_381.G1
    f = curve.base
    L = f.num_limbs
    n = 1 << log_n
    rng = np.random.default_rng(0)
    Ls = curve.scalar.num_limbs
    scn = rng.integers(0, 1 << 16, size=(Ls, n), dtype=np.uint32)
    scn[-1] >>= 2
    bits = 16 * Ls - 2
    sc = jnp.asarray(scn)
    px = jnp.asarray(rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32))
    py = jnp.asarray(rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32))
    A = AffinePoints(px, py, jnp.zeros(n, dtype=bool))  # garbage pts: timing only

    W, half, splits, _ = M._window_geometry(c, bits)
    print(f"n=2^{log_n} c={c} W={W} half={half} G={M._group_windows(W, n, L)}")

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def phase_sort(curve, points, scalars, c, scalar_bits):
        digits = M.signed_digits(curve.scalar, scalars, c, scalar_bits and W)
        mag = jnp.abs(digits)
        mag = jnp.where(points.inf[None, :], 0, mag)
        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (W, n))
        for w, v_w, K_w in splits:
            row = mag[w]
            sub = (iota[0] % K_w) * v_w
            mag = mag.at[w].set(jnp.where(row > 0, row + sub, 0))
        payload = iota | ((digits < 0).astype(jnp.int32) << 30)
        keys, packed = jax.lax.sort_key_val(mag, payload, dimension=1)
        S = M._searchsorted_batch(keys, half + 1)
        return packed, S

    t_sort = timeit(lambda: phase_sort(curve, A, sc, c, bits))
    packed, S = phase_sort(curve, A, sc, c, bits)
    counts = S[:, 1:] - S[:, :-1]
    rmax = int(np.asarray(jnp.max(counts)))
    print(f"sort+digits+fences: {t_sort*1e3:.1f} ms  (max occupancy {rmax}, "
          f"mean {n/half:.0f}, slack {rmax/(n/half):.2f})")

    pxy = jnp.concatenate([px, py], axis=0)
    pxy = pxy[0::2] | (pxy[1::2] << 16)
    G = M._group_windows(W, n, L)

    @jax.jit
    def phase_mat(packed, pxy):
        pxyT = pxy.T
        outs = []
        for g0 in range(0, W, G):
            g1 = min(W, g0 + G)
            perm = (packed[g0:g1] & ((1 << 29) - 1)).reshape(-1)
            sgn = (((packed[g0:g1] >> 30) & 1) != 0).reshape(-1)
            outs.append(M._neg_y_rows(f, pxyT[perm], sgn))
        return outs

    t_mat = timeit(lambda: phase_mat(packed, pxy))
    rows_groups = phase_mat(packed, pxy)
    print(f"materialize ({W}x{n} rows): {t_mat*1e3:.1f} ms")

    @jax.jit
    def phase_loop(rows_groups, S):
        counts = S[:, 1:] - S[:, :-1]
        st_parts = []
        for i, g0 in enumerate(range(0, W, G)):
            g1 = min(W, g0 + G)
            st = sw.xyzz_zero(curve, (g1 - g0, half))
            st = M._round_loop_presorted(
                curve, rows_groups[i], S[g0:g1], n,
                jnp.max(counts[g0:g1]), st)
            st_parts.append(st)
        return XYZZPoints(*(jnp.concatenate(v, axis=1) for v in zip(*st_parts)))

    t_loop = timeit(lambda: phase_loop(rows_groups, S))
    state = phase_loop(rows_groups, S)
    print(f"round loop: {t_loop*1e3:.1f} ms")

    t_red = timeit(lambda: M.msm_reduce(curve, state, c, bits))
    print(f"reduce: {t_red*1e3:.1f} ms")

    total = t_sort + t_mat + t_loop + t_red
    print(f"TOTAL {total*1e3:.1f} ms -> {n/total/1e3:.0f}k pts/s "
          f"(phases; end-to-end may fuse better)")

    def full():
        return M.msm(curve, A, sc, c, bits)

    t_full = timeit(full)
    print(f"end-to-end msm: {t_full*1e3:.1f} ms -> {n/t_full/1e3:.0f}k pts/s")


if __name__ == "__main__":
    main()
