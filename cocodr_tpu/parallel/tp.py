"""Tensor-parallel (model-axis) parameter sharding.

The reference has no TP (SURVEY.md §2.3) — unnecessary at <=335M params —
but the mesh carries a `model` axis so scaling up is a sharding change, not
a code change. Shardings are assigned by path-matching the parameter tree
(Megatron-style: attention heads and FFN hidden dim split over `model`);
GSPMD propagates them through the jitted step and inserts the all-reduces.

With model=1 every spec degenerates to replication, so the same code path
serves pure DP.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cocodr_tpu.core.mesh import MODEL_AXIS

# (path-suffix match, spec builder). Layer-stacked params carry a leading
# `layer` axis; unstacked (c_head) variants match the shorter suffixes.
_RULES = (
    # attention projections: split heads (N) over model
    (("attention", "query", "kernel"), lambda nd: _axis(nd, -2)),
    (("attention", "key", "kernel"), lambda nd: _axis(nd, -2)),
    (("attention", "value", "kernel"), lambda nd: _axis(nd, -2)),
    (("attention", "query", "bias"), lambda nd: _axis(nd, -2)),
    (("attention", "key", "bias"), lambda nd: _axis(nd, -2)),
    (("attention", "value", "bias"), lambda nd: _axis(nd, -2)),
    # attention output: contract over heads -> split input N
    (("attention", "output", "kernel"), lambda nd: _axis(nd, -3)),
    # FFN: split the hidden dim
    (("intermediate", "kernel"), lambda nd: _axis(nd, -1)),
    (("intermediate", "bias"), lambda nd: _axis(nd, -1)),
    (("ffn_output", "kernel"), lambda nd: _axis(nd, -2)),
)


def _axis(ndim: int, axis: int) -> P:
    axes = [None] * ndim
    axes[axis % ndim] = MODEL_AXIS
    return P(*axes)


def _spec_for(path, ndim: int) -> P:
    keys = tuple(str(getattr(k, "key", k)) for k in path)
    for suffix, builder in _RULES:
        if keys[-len(suffix):] == suffix:
            return builder(ndim)
    return P()  # replicated (embeddings, layernorms, heads, biases)


def tp_param_shardings(params: Any, mesh: Mesh):
    """NamedSharding pytree for the DualEncoder/Condenser param tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, _spec_for(path, x.ndim)), params
    )


def shard_params_tp(params: Any, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s),
        params,
        tp_param_shardings(params, mesh),
    )
