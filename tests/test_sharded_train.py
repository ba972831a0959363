"""Mesh helpers: replicated train state + batch sharding over the data axis."""
import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from cocodr_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, MeshConfig, create_mesh
from cocodr_tpu.parallel.sharded_train import (
    global_batch_size,
    shard_train_setup,
)
from cocodr_tpu.utils.train_state import TrainState


def test_mesh_config():
    mesh = create_mesh(MeshConfig(), jax.devices()[:8])
    assert mesh.shape == {DATA_AXIS: 8, MODEL_AXIS: 1}
    mesh2 = create_mesh(MeshConfig(model=2), jax.devices()[:8])
    assert mesh2.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}


def test_shard_train_setup():
    mesh = create_mesh(MeshConfig(), jax.devices()[:8])
    params = {"w": jnp.ones((4, 4))}
    tx = optax.sgd(0.1)
    state = TrainState.create(params, tx)
    state, put_batch = shard_train_setup(mesh, state)
    # replicated across the mesh
    assert len(state.params["w"].sharding.device_set) == 8
    batch = put_batch({"x": jnp.ones((16, 3))})
    assert DATA_AXIS in str(batch["x"].sharding.spec)
    assert global_batch_size(mesh, 4) == 32
