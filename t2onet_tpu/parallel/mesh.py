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


# ---------------------------------------------------------------------------
# 2-D (data x model) layout
# ---------------------------------------------------------------------------

MODEL_AXIS = "model"


def make_2d_mesh(n_devices: Optional[int] = None, model_par: int = 2,
                 devices: Optional[Sequence] = None) -> Mesh:
    """A (data x model) mesh: batch over `data`, the operator bank's 8-way
    op axis over `model`.

    The model here is ~30M params with <=17-token sequences, so tensor
    parallelism only pays on the one genuinely wide stacked dimension: the
    per-op parameter heads (N_OPS=8 leading dim, see
    models/actor.py:ParamHeads). Everything else stays replicated.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % model_par != 0:
        raise ValueError(f"{n_devices} devices not divisible by "
                         f"model_par={model_par}")
    arr = np.asarray(devices[:n_devices]).reshape(n_devices // model_par,
                                                  model_par)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _is_head_leaf(path, leaf) -> bool:
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    ndim = getattr(leaf, "ndim", None)
    shape = getattr(leaf, "shape", None)
    return ("heads" in names and ndim is not None and ndim >= 1
            and shape[0] == 8)


def state_shardings(mesh: Mesh, state):
    """A TrainState-shaped pytree of NamedShardings for a (data x model)
    mesh: per-op head weights (and their Adam moments, whose tree paths
    contain the same param key names) sharded over `model` on the stacked
    op dim; everything else replicated.

    Keeping the optimizer moments aligned with the model-sharded heads is
    load-bearing: replicated moments + sharded grads make GSPMD insert
    cross-module all-to-alls between the phases (observed to deadlock the
    CPU collective runtime in CI-style virtual meshes).
    """
    has_model = MODEL_AXIS in mesh.axis_names

    def spec(path, leaf):
        if has_model and _is_head_leaf(path, leaf):
            return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    rep = NamedSharding(mesh, P())
    return state.replace(
        step=rep,
        params=jax.tree_util.tree_map_with_path(spec, state.params),
        batch_stats=jax.tree_util.tree_map(lambda _: rep, state.batch_stats),
        opt_state=jax.tree_util.tree_map_with_path(spec, state.opt_state),
    )


def shard_state(state, sharding_tree):
    """device_put a TrainState according to a TrainState of shardings."""
    return state.replace(
        step=jax.device_put(state.step, sharding_tree.step),
        params=jax.device_put(state.params, sharding_tree.params),
        batch_stats=jax.device_put(state.batch_stats,
                                   sharding_tree.batch_stats),
        opt_state=jax.device_put(state.opt_state, sharding_tree.opt_state),
    )
