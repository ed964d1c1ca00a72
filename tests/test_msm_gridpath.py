"""End-to-end parity of the TPU kernel-path MSM (static-bound two-band
padded-grid accumulate, ec/msm.py:_accum_grid) against the host oracle, run
in Pallas interpreter mode on CPU.

Covers the edge surface the grid path must preserve: points at infinity,
zero scalars, duplicate points (doubling edge inside a shared bucket),
full-width scalars (negative digits), and the dynamic residual loop (the
tiny bn254/c=8 config routinely exceeds the static band bounds).

Compiled-path evidence: bench.py's host known-answer gate verifies the same
path on the real TPU on every bench run (reference always value-checks its
MSMs too: test-templates/src/msm.rs:17-32).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("ZKARRAY_RUN_SLOW"),
    reason="interpreter-mode grid-accumulate takes minutes on CPU; "
    "set ZKARRAY_RUN_SLOW=1 (the compiled path is known-answer-checked "
    "on TPU by every bench.py run)",
)
def test_msm_grid_path_matches_oracle(monkeypatch):
    monkeypatch.setenv("ZKARRAY_PALLAS_INTERPRET", "1")

    import jax.numpy as jnp
    from ec_oracle import ec_add, ec_mul
    from zkarray.curves import bn254
    from zkarray.ec import msm as msm_mod, sw

    monkeypatch.setattr(msm_mod, "ACCUM_T", 2)

    curve = bn254.G1
    mod = curve.base.modulus
    r = curve.scalar.modulus
    gen = (curve.gen_x, curve.gen_y)
    rng = np.random.default_rng(5)
    n = 256
    ks = [int(k) for k in rng.integers(1, 1 << 20, size=n)]
    pts = [ec_mul(gen, k, curve.a_int, mod) for k in ks]
    pts[10] = pts[11]  # duplicate -> doubling edge in a shared bucket
    pts[12] = None  # infinity
    pts[13] = None
    scalars_int = [int(s) for s in rng.integers(0, 1 << 63, size=n)]
    scalars_int[5] = 0
    scalars_int[6] = r - 1  # full width -> negative digits everywhere
    scalars_int[10] = scalars_int[11]

    A = curve.affine_from_ints(pts)
    Ls = curve.scalar.num_limbs
    sc = np.zeros((Ls, n), dtype=np.uint32)
    for j, s in enumerate(scalars_int):
        for i in range(Ls):
            sc[i, j] = (s >> (16 * i)) & 0xFFFF
    sc = jnp.asarray(sc)

    want = None
    for P, s in zip(pts, scalars_int):
        if P is None:
            continue
        q = ec_mul(P, s % r, curve.a_int, mod)
        want = q if want is None else ec_add(want, q, curve.a_int, mod)

    res = msm_mod.msm(curve, A, sc, c=8)  # W*half = 4224 >= 4096: grid path
    got = curve.affine_to_ints(
        sw.xyzz_to_affine(
            curve, sw.XYZZPoints(*(v.reshape(v.shape + (1,)) for v in res))
        )
    )[0]
    assert got == want
