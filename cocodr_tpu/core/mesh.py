"""Device mesh + sharding runtime.

Replaces the reference's NCCL process groups (`init_process_group("nccl")`,
reference ANCE/drivers/run_ann.py:833-843) with a single
`jax.sharding.Mesh`: ranks become mesh axes, barriers become program order,
and every collective is an XLA op inside a jitted function.

Axes:
  data   — batch / corpus sharding (the reference's only parallelism: DDP).
  model  — reserved tensor-parallel axis (size 1 for <=335M params; kept so
           shardings are already mesh-general when scaling up).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = self.model
        data = self.data if self.data > 0 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} != {n_devices} devices"
            )
        return data, model


def create_mesh(
    config: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    data, model = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, *rest_axes: Optional[str]) -> NamedSharding:
    """Shard leading dim over the data axis; rest as given (None=replicated)."""
    return NamedSharding(mesh, P(DATA_AXIS, *rest_axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch pytree sharded along the data axis."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch
    )


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
