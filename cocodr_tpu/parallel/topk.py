"""Distributed top-k merge over the mesh.

Replaces the reference's per-rank knn + pickled object all_gather + argsort
merge (reference ANCE/utils/eval_mrr.py:231-261, utils/util.py:439-479):
each device computes local top-k over its corpus shard (ops.mips), then the
(scores, global-ids) pairs are all-gathered over the data axis and reduced
with one more top_k — entirely on device, no filesystem round-trip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def distributed_topk(local_vals, local_ids, k: int, axis_name: str):
    """Inside shard_map/pjit-manual: merge per-device top-k candidates.

    local_vals [Q, k'] fp32, local_ids [Q, k'] GLOBAL ids. Returns
    replicated (vals [Q, k], ids [Q, k]).
    """
    all_vals = jax.lax.all_gather(local_vals, axis_name, axis=1)  # [Q, W, k']
    all_ids = jax.lax.all_gather(local_ids, axis_name, axis=1)
    Q = local_vals.shape[0]
    all_vals = all_vals.reshape(Q, -1)
    all_ids = all_ids.reshape(Q, -1)
    vals, pos = jax.lax.top_k(all_vals, k)
    ids = jnp.take_along_axis(all_ids, pos, axis=1)
    # every device computed the identical merge; pmax is a numeric no-op that
    # marks the result replicated for shard_map's varying-axis checker
    vals = jax.lax.pmax(vals, axis_name)
    ids = jax.lax.pmax(ids, axis_name)
    return vals, ids


def sharded_mips_topk(queries, corpus_shard, shard_offset, k, axis_name,
                      tile=16384, approx=False, exact_fp32=False):
    """Per-device body: local exact MIPS over this device's corpus shard,
    ids lifted to global space, then cross-shard merge."""
    from cocodr_tpu.ops.mips import mips_topk

    vals, ids = mips_topk(
        queries, corpus_shard, k, tile=tile, approx=approx,
        exact_fp32=exact_fp32,
    )
    ids = jnp.where(ids >= 0, ids + shard_offset, ids)
    return distributed_topk(vals, ids, k, axis_name)
