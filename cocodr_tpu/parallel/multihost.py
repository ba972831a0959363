"""Multi-slice (multi-host) mesh construction and DCN-aware merges.

The reference scales by adding NCCL ranks on one ethernet fabric; every
collective pays the same (slow) links (reference ANCE/drivers/run_ann.py:
833-843). On TPU pods the fabric is two-tier: ICI within a slice (fast),
DCN across slices (slow). This module keeps that distinction first-class:

- `hybrid_mesh` builds a Mesh whose leading `replica` axis spans slices
  (DCN) while `data`/`model` axes stay within a slice (ICI), using
  jax.experimental.mesh_utils.create_hybrid_device_mesh on real multi-slice
  topologies.
- `two_level_topk` merges per-device top-k candidates within the slice
  first (ICI all_gather of [Q, k'] per device), then across slices (DCN
  all_gather of only [Q, k] per slice) — the DCN leg carries k, not
  n_ici_devices * k, candidates per query.

Training needs no special handling: gradients are reduced by XLA/GSPMD
along whatever axes the params are replicated over, and GSPMD already
schedules the contributing collectives hierarchically on hybrid meshes.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from cocodr_tpu.parallel.topk import distributed_topk


def n_slices(devices: Optional[Sequence] = None) -> int:
    """Number of ICI slices (1 on single-slice / CPU backends)."""
    devices = list(devices if devices is not None else jax.devices())
    return len({getattr(d, "slice_index", 0) for d in devices})


def hybrid_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence] = None,
    force_replicas: Optional[int] = None,
) -> Mesh:
    """Mesh with axes ('replica', 'data', 'model').

    `replica` spans slices (collectives over it ride DCN); `data`/`model`
    stay within a slice (ICI). data=-1 fills the remaining devices. On a
    single-slice (or CPU) backend the replica axis is 1 unless
    `force_replicas` is given, which splits the flat device list into
    pseudo-slices — for testing DCN-structured programs on
    xla_force_host_platform_device_count meshes.
    """
    devices = list(devices if devices is not None else jax.devices())
    n_dev = len(devices)
    reps = force_replicas or n_slices(devices)
    per_slice = n_dev // reps
    assert reps * per_slice == n_dev, (n_dev, reps)
    if data == -1:
        data = per_slice // model
    assert data * model == per_slice, (data, model, per_slice)

    if reps > 1 and force_replicas is None:
        from jax.experimental import mesh_utils

        dm = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, data, model),
            dcn_mesh_shape=(reps, 1, 1),
            devices=devices,
        )
    else:
        dm = np.asarray(devices).reshape(reps, data, model)
    return Mesh(dm, ("replica", "data", "model"))


def two_level_topk(local_vals, local_ids, k: int, ici_axis: str = "data",
                   dcn_axis: str = "replica"):
    """Inside shard_map over a hybrid mesh: hierarchical top-k merge.

    Merge candidates within the slice over `ici_axis` first, then across
    slices over `dcn_axis`; the cross-slice gather moves [Q, k] per slice
    instead of [Q, n_ici * k]. Returns (vals, ids) replicated over both
    axes. With either axis of size 1 the corresponding merge is a cheap
    self-gather, so the same program runs unmodified on one slice.
    """
    vals, ids = distributed_topk(local_vals, local_ids, k, ici_axis)
    return distributed_topk(vals, ids, k, dcn_axis)


def sharded_mips_topk_2level(queries, corpus_shard, shard_offset, k,
                             ici_axis: str = "data",
                             dcn_axis: str = "replica", **mips_kw):
    """Per-device body: local exact MIPS over this device's corpus shard
    (the corpus is sharded over BOTH axes), then the two-level merge."""
    from cocodr_tpu.ops.mips import mips_topk

    vals, ids = mips_topk(queries, corpus_shard, k, **mips_kw)
    ids = jnp.where(ids >= 0, ids + shard_offset, ids)
    return two_level_topk(vals, ids, k, ici_axis, dcn_axis)
