"""Device-mesh construction — the framework's communication backend.

Reference analog: the reference's only parallelism is rayon work-stealing
(SURVEY.md §2.7); there is no communication backend. Here the first-class
equivalent is a `jax.sharding.Mesh` with named axes and XLA collectives
(psum/all_gather/all_to_all/ppermute) over ICI/DCN, invoked via shard_map.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None, axis: str = "shards", devices=None
) -> Mesh:
    """1-D mesh over (a prefix of) the available devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(shape: Sequence[int], axes=("hosts", "chips"), devices=None) -> Mesh:
    devs = np.asarray(list(devices if devices is not None else jax.devices()))
    return Mesh(devs[: shape[0] * shape[1]].reshape(shape), tuple(axes))
