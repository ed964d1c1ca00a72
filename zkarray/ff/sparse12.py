"""Sparse Fp12/Fp6 multiplications for pairing line evaluation.

Reference analog: Fp6::mul_by_01 / mul_by_1 (ff/src/fields/models/
fp6_3over2.rs) and Fp12::mul_by_014 / mul_by_034 (ff/src/fields/models/
fp12_2over3over2.rs:13-110): multiplying the Miller-loop accumulator by a
line whose Fp12 representation has only coefficients {0,1,4} (M-twist) or
{0,3,4} (D-twist) costs 13 Fp2 muls instead of 18.

All Fp2-level products inside one helper are batched through
ExtOps._mul_many (one fused prime-field mul over k·batch lanes) — see
towers.py for why this matters on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def fp6_mul_by_1(fq6, a, c1):
    """a · (0, c1, 0) — 3 base muls."""
    B = fq6.base
    p2, p0, p1 = fq6._mul_many([(a[2], c1), (a[0], c1), (a[1], c1)])
    return fq6._stack([fq6.mul_nonresidue(p2), p0, p1])


def fp6_mul_by_01(fq6, a, c0, c1):
    """a · (c0, c1, 0) — 5 base muls (reference fp6_3over2.rs mul_by_01)."""
    B = fq6.base
    v0, v1, m12, m01, m02 = fq6._mul_many(
        [
            (a[0], c0),
            (a[1], c1),
            (B.add(a[1], a[2]), c1),
            (B.add(a[0], a[1]), B.add(c0, c1)),
            (B.add(a[0], a[2]), c0),
        ]
    )
    r0 = B.add(v0, fq6.mul_nonresidue(B.sub(m12, v1)))
    r1 = B.sub(B.sub(m01, v0), v1)
    r2 = B.add(B.sub(m02, v0), v1)
    return fq6._stack([r0, r1, r2])


def fp6_mul_by_fp2(fq6, a, c0):
    """a · (c0, 0, 0) — 3 base muls."""
    B = fq6.base
    ps = fq6._mul_many([(a[j], c0) for j in range(3)])
    return fq6._stack(list(ps))


def fp12_mul_by_014(fq12, f, c0, c1, c4):
    """f · [(c0, c1, 0) + (0, c4, 0)·w] — M-twist line (13 Fp2 muls)."""
    fq6 = fq12.base
    B6 = fq6.base  # Fp2 ops
    a0, a1 = f[0], f[1]
    v0 = fp6_mul_by_01(fq6, a0, c0, c1)
    v1 = fp6_mul_by_1(fq6, a1, c4)
    t = fp6_mul_by_01(fq6, fq6.add(a0, a1), c0, B6.add(c1, c4))
    r1 = fq6.sub(fq6.sub(t, v0), v1)
    r0 = fq6.add(v0, fq12.mul_nonresidue(v1))
    return fq12._stack([r0, r1])


def fp12_mul_by_034(fq12, f, c0, c3, c4):
    """f · [(c0, 0, 0) + (c3, c4, 0)·w] — D-twist line (13 Fp2 muls)."""
    fq6 = fq12.base
    B6 = fq6.base
    a0, a1 = f[0], f[1]
    v0 = fp6_mul_by_fp2(fq6, a0, c0)
    v1 = fp6_mul_by_01(fq6, a1, c3, c4)
    t = fp6_mul_by_01(fq6, fq6.add(a0, a1), B6.add(c0, c3), c4)
    r1 = fq6.sub(fq6.sub(t, v0), v1)
    r0 = fq6.add(v0, fq12.mul_nonresidue(v1))
    return fq12._stack([r0, r1])
