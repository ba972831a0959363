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


def shard_train_init(mesh: Mesh, params, tx, extra=None):
    """Create a TrainState laid out for the mesh: params tensor-parallel over
    the model axis when it is >1 (replicated otherwise), optimizer moments
    inheriting the param shardings, step/extra replicated. Returns
    (state, put_batch) where put_batch shards a host batch over the data
    axis. This is the CLI's entry into multi-device training — the
    reference's torch.distributed.launch equivalent
    (ANCE/drivers/run_ann.py:833-843)."""
    from cocodr_tpu.core.mesh import MODEL_AXIS
    from cocodr_tpu.utils.train_state import TrainState

    repl = NamedSharding(mesh, P())
    if mesh.shape[MODEL_AXIS] > 1:
        from cocodr_tpu.parallel.tp import shard_params_tp

        params = shard_params_tp(params, mesh)
    else:
        params = jax.device_put(params, repl)
    if extra is not None:
        extra = jax.device_put(extra, repl)
    state = TrainState.create(params, tx, extra=extra)
    state = state.replace(step=jax.device_put(state.step, repl))
    dsh = NamedSharding(mesh, P(DATA_AXIS))

    def put_batch(batch: dict) -> dict:
        return {k: jax.device_put(v, dsh) for k, v in batch.items()}

    return state, put_batch


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
