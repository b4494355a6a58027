"""Mesh + sharding helpers (the reference has no distributed story — this
is new, first-class TPU infrastructure; SURVEY.md §2.10)."""

from t2onet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
