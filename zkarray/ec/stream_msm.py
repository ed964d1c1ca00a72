"""Streaming / chunked MSM variants for larger-than-memory inputs.

Reference analog: msm_chunks (ec/src/scalar_mul/variable_base/mod.rs:119-150)
and ChunkedPippenger / HashMapPippenger (stream_pippenger.rs:10-128). On TPU
the chunk size is HBM-capacity-driven: each chunk runs the full bucket
pipeline on device; partial XYZZ sums accumulate across chunks.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from zkarray.core import limbs as lb
from zkarray.ec import msm as msm_mod
from zkarray.ec import sw
from zkarray.ec.sw import AffinePoints, SWCurveSpec, XYZZPoints
from zkarray.ff import fp


def msm_chunks(
    curve: SWCurveSpec,
    chunk_iter: Iterable[Tuple[AffinePoints, jnp.ndarray]],
    c: Optional[int] = None,
) -> XYZZPoints:
    """MSM over a stream of (points, scalars) chunks (reference msm_chunks,
    variable_base/mod.rs:119-150).

    Device pipeline: chunks at most as wide as the first are accumulated
    into ONE carried (W, half) bucket state (msm.ChunkedMSM — bucket
    reduction paid once at the end); an occasional wider chunk falls back
    to a standalone MSM whose partial is XYZZ-added in.
    """
    cm = None
    extra = None
    for pts, scalars in chunk_iter:
        n = pts.x.shape[1]
        if cm is None:
            cm = msm_mod.ChunkedMSM(curve, chunk_size=n, c=c)
        if n <= cm.chunk_size:
            cm.add_chunk(pts, scalars)
            continue
        part = msm_mod.msm(curve, pts, scalars, cm.c)
        if extra is None:
            extra = part
        else:
            e = lambda s: s.reshape(s.shape + (1,))
            merged = sw.xyzz_add(
                curve,
                XYZZPoints(*(e(s) for s in extra)),
                XYZZPoints(*(e(s) for s in part)),
            )
            extra = XYZZPoints(*(s[..., 0] for s in merged))
    if cm is None:
        return sw.xyzz_zero(curve, ())
    total = cm.result()
    if extra is not None:
        e = lambda s: s.reshape(s.shape + (1,))
        merged = sw.xyzz_add(
            curve,
            XYZZPoints(*(e(s) for s in total)),
            XYZZPoints(*(e(s) for s in extra)),
        )
        total = XYZZPoints(*(s[..., 0] for s in merged))
    return total


class ChunkedPippenger:
    """Fixed-size device buffer; flush runs the full MSM per chunk
    (reference ChunkedPippenger with msm_bigint flush)."""

    def __init__(self, curve: SWCurveSpec, chunk_size: int = 1 << 20, c=None):
        self.curve = curve
        self.chunk_size = chunk_size
        self.c = c
        self._pts: list = []
        self._scalars: list = []
        self.total = None

    def add(self, point_xy, scalar_int: int):
        self._pts.append(point_xy)
        self._scalars.append(int(scalar_int))
        if len(self._pts) >= self.chunk_size:
            self._flush()

    def _flush(self):
        if not self._pts:
            return
        A = self.curve.affine_from_ints(self._pts)
        s = fp.from_ints(self.curve.scalar, self._scalars, mont=False)
        part = msm_mod.msm(self.curve, A, s, self.c)
        if self.total is None:
            self.total = part
        else:
            e = lambda x: x.reshape(x.shape + (1,))
            merged = sw.xyzz_add(
                self.curve,
                XYZZPoints(*(e(x) for x in self.total)),
                XYZZPoints(*(e(x) for x in part)),
            )
            self.total = XYZZPoints(*(x[..., 0] for x in merged))
        self._pts, self._scalars = [], []

    def finalize(self) -> XYZZPoints:
        self._flush()
        return self.total if self.total is not None else sw.xyzz_zero(self.curve, ())


class HashMapPippenger:
    """Scalar-coalescing by base point before the final MSM
    (reference HashMapPippenger)."""

    def __init__(self, curve: SWCurveSpec, c=None):
        self.curve = curve
        self.c = c
        self._acc = {}

    def add(self, point_xy, scalar_int: int):
        key = point_xy
        self._acc[key] = (self._acc.get(key, 0) + int(scalar_int)) % self.curve.scalar.modulus

    def finalize(self) -> XYZZPoints:
        if not self._acc:
            return sw.xyzz_zero(self.curve, ())
        pts = list(self._acc.keys())
        scalars = [self._acc[p] for p in pts]
        A = self.curve.affine_from_ints(pts)
        s = fp.from_ints(self.curve.scalar, scalars, mont=False)
        return msm_mod.msm(self.curve, A, s, self.c)
