"""Mesh-sharded training wrapper.

The reference's only training parallelism is DDP data parallelism
(reference ANCE/drivers/run_ann.py:177-184); here the equivalent is pjit:
params/opt-state replicated over the mesh, batch sharded along the data
axis, XLA inserting the gradient all-reduces. The mesh keeps a `model` axis
so tensor-parallel shardings can be layered on later without API changes.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cocodr_tpu.core.mesh import DATA_AXIS


def shard_train_setup(mesh: Mesh, state):
    """Replicate a TrainState across the mesh. Returns (state, put_batch)."""
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P(DATA_AXIS))
    state = jax.device_put(state, repl)

    def put_batch(batch: dict) -> dict:
        return {k: jax.device_put(v, dsh) for k, v in batch.items()}

    return state, put_batch


def global_batch_size(mesh: Mesh, per_device: int) -> int:
    return per_device * mesh.shape[DATA_AXIS]
