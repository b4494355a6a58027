"""Device mesh and sharding utilities.

The reference is a single-process single-GPU codebase (SURVEY.md §2.10);
the TPU-native equivalent of its batch-64 loop is data parallelism over a
1-D `jax.sharding.Mesh`: the batch axis of every tensor is sharded over
the `data` axis, parameters and optimizer state are replicated, and XLA
inserts the gradient psum over ICI. Model size (~30M params) makes DP the
right — and only useful — parallelism for this workload; the "long" axes
(pixels, beam hypotheses, planner candidates) are likewise batch-like and
shard the same way.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, n_devices: Optional[int] = None,
              axis: str = DATA_AXIS) -> Mesh:
    """A 1-D data-parallel mesh over all (or the first n) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 (batch) over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Device-put a pytree of host arrays with dim 0 sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
