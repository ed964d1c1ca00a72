"""Multi-chip MSM: points sharded across the mesh, buckets reduced over ICI.

Reference analog: the rayon window/bucket parallelism in
ec/src/scalar_mul/variable_base/mod.rs:437-503 (SURVEY.md §2.7 #3). Here each
device runs the full Pippenger bucket pipeline on its point shard, producing
one partial XYZZ sum; partials are all_gather'd (D points — tiny) and
tree-combined on every device, so the result is replicated.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zkarray.ec import msm as msm_mod
from zkarray.ec import sw
from zkarray.ec.sw import AffinePoints, SWCurveSpec, XYZZPoints


def msm_sharded(
    curve: SWCurveSpec,
    points: AffinePoints,
    scalars: jnp.ndarray,
    mesh: Mesh,
    c: Optional[int] = None,
    axis: str = "shards",
    max_scalar_bits: Optional[int] = None,
) -> XYZZPoints:
    """Σ scalars_i · points_i with the point axis sharded over ``mesh``.

    points/scalars may be host arrays; they are device_put with the point
    axis partitioned. Result: replicated single XYZZ point.

    ``max_scalar_bits``: static bound on scalar bit length (see
    ec/msm.py:msm) — shrinks the per-shard compiled window count, which
    dominates compile time for small-scalar workloads.
    """
    n_dev = mesh.shape[axis]
    n = points.x.shape[1]
    if n % n_dev:
        raise ValueError(f"point count {n} must divide by mesh size {n_dev}")

    pt_sharding = NamedSharding(mesh, P(None, axis))
    points = AffinePoints(
        jax.device_put(points.x, pt_sharding),
        jax.device_put(points.y, pt_sharding),
        jax.device_put(points.inf, NamedSharding(mesh, P(axis))),
    )
    scalars = jax.device_put(scalars, pt_sharding)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(axis), P(None, axis)),
        out_specs=P(),
        check_vma=False,
    )
    def _shard_msm(px, py, pinf, sc):
        local = msm_mod.msm(
            curve, AffinePoints(px, py, pinf), sc, c, max_scalar_bits
        )  # XYZZ ()
        # gather per-device partials: (L,) -> (L, D) along a new axis
        parts = XYZZPoints(
            *(
                jax.lax.all_gather(s, axis, axis=1, tiled=False).swapaxes(1, 1)
                for s in local
            )
        )
        # all_gather inserts the device axis at position `axis=1` → (L, D)
        d = parts.x.shape[1]
        acc = parts
        while d > 1:
            h = d // 2
            lo = XYZZPoints(*(s[:, :h] for s in acc))
            hi = XYZZPoints(*(s[:, h : 2 * h] for s in acc))
            red = sw.xyzz_add(curve, lo, hi)
            if d % 2:
                red = XYZZPoints(
                    *(jnp.concatenate([r, s[:, 2 * h :]], axis=1) for r, s in zip(red, acc))
                )
                d = h + 1
            else:
                d = h
            acc = red
        return XYZZPoints(*(s[:, 0] for s in acc))

    return _shard_msm(points.x, points.y, points.inf, scalars)
