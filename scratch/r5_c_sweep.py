"""Round-5 lab: window-size (c) sweep for the grid-path MSM at 2^20.

VERDICT round-4 task 1c: re-test c=14/15 now that bucket reduction is cheap
(111 ms, size-independent). Times msm() at 2^20 for c in {12, 13, 14} with
the host known-answer check on each result.

Usage: python scratch/r5_c_sweep.py [log_n] [c ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench as B


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cs = [int(c) for c in sys.argv[2:]] or [12, 13, 14]
    B._setup_jax()
    import jax.numpy as jnp
    from zkarray.curves import bls12_381
    from zkarray.ec import msm as msm_mod
    from zkarray.ec.sw import AffinePoints

    curve = bls12_381.G1
    n = 1 << log_n
    rng = np.random.default_rng(0)
    px, py, sc, ks, bits = B._tiled_inputs(curve, n, rng)
    A = AffinePoints(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(np.zeros(n, dtype=bool))
    )
    s = jnp.asarray(sc)

    for c in cs:
        t0 = time.perf_counter()
        out = msm_mod.msm(curve, A, s, c, bits)
        B._sync(out.zz)
        tc = time.perf_counter() - t0
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            out = msm_mod.msm(curve, A, s, c, bits)
        B._sync(out.zz)
        dt = (time.perf_counter() - t0) / iters
        ok = B._check_msm(curve, out, ks, sc)
        print(
            f"c={c}: {dt*1e3:.1f} ms ({n/dt/1e6:.3f} M pts/s) "
            f"first+compile {tc:.1f}s verified={ok}",
            flush=True,
        )


if __name__ == "__main__":
    main()
