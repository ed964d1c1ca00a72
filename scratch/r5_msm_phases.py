"""Round-5 lab: phase timing of the grid-path MSM on the real TPU.

The accumulate is one jit (_accum_grid inside msm_accumulate), so phases
are split as: (1) digits+sort+fences (separate jit of the same ops),
(2) full accumulate (includes the hoisted feed gathers + grid sweeps),
(3) reduce. Run: python scratch/r5_msm_phases.py [log_n] [c]
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
from zkarray.ec.sw import AffinePoints
from zkarray.ff import fp


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timeit(f, n=3):
    r = f()
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    sync(r)
    return (time.perf_counter() - t0) / n


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
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
    r1b, r2b = M._accum_bounds(c, n, M.ACCUM_T)
    G = M._group_windows(W, half, r1b)
    print(f"n=2^{log_n} c={c} W={W} half={half} r1b={r1b} r2b={r2b} G={G}")

    @functools.partial(jax.jit, static_argnums=(0,))
    def phase_sort(curve, points, scalars):
        digits = M.signed_digits(curve.scalar, scalars, c, W)
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

    t_sort = timeit(lambda: phase_sort(curve, A, sc))
    print(f"digits+sort+fences: {t_sort*1e3:.1f} ms")

    state0 = sw.xyzz_zero(curve, (W, half))
    t_acc = timeit(lambda: M.msm_accumulate(curve, A, sc, c, bits, state0))
    print(f"accumulate (feed gathers + grid sweeps, incl. sort): "
          f"{t_acc*1e3:.1f} ms")

    state = M.msm_accumulate(curve, A, sc, c, bits, state0)
    t_red = timeit(lambda: M.msm_reduce(curve, state, c, bits))
    print(f"reduce: {t_red*1e3:.1f} ms")

    t_full = timeit(lambda: M.msm(curve, A, sc, c, bits))
    print(f"end-to-end msm: {t_full*1e3:.1f} ms -> {n/t_full/1e3:.0f}k pts/s")
    slots = (r1b + r2b // 8) * W * half
    print(f"model: {slots/1e6:.1f}M slot-rounds; accumulate-sort = "
          f"{(t_acc-t_sort)*1e3:.0f} ms -> {(t_acc-t_sort)/slots*1e9:.1f} ns/slot "
          f"(payload+coord gathers + kernel adds)")


if __name__ == "__main__":
    main()
