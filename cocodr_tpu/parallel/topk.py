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
                      tile=16384, approx=False, exact_fp32=False,
                      n_valid=None, method="auto", k_local=None):
    """Per-device body: local MIPS over this device's corpus shard, ids
    lifted to global space, then cross-shard merge. The per-shard search
    dispatches exactly like the single-device path: pallas hierarchical
    (or 'fast' block-argmax) on TPU backends, XLA block-max elsewhere,
    naive per-tile sort for exact_fp32 — so multi-chip mining/eval runs
    the same kernels (and returns the same rankings) as one chip.

    n_valid: number of real rows in this shard (rows >= n_valid are padding
    added to equalize shard sizes; their hits are masked out).
    k_local: width of the per-shard search (>= k); the caller passes
    k + pad so replicate-padding duplicates in the final shard cannot
    evict real candidates from the local list before the mask."""
    from cocodr_tpu.ops.mips import (
        mips_topk,
        mips_topk_blockmax,
        mips_topk_refined,
        resolve_search_method,
    )

    if k_local is None:
        k_local = k
    k_local = min(k_local, corpus_shard.shape[0])
    method = resolve_search_method(method, exact_fp32=exact_fp32)
    if method == "pallas":
        from cocodr_tpu.ops.pallas_mips import mips_topk_hierarchical

        vals, ids = mips_topk_hierarchical(queries, corpus_shard, k_local)
    elif method == "fast":
        from cocodr_tpu.ops.pallas_mips import mips_topk_fast

        vals, ids = mips_topk_fast(queries, corpus_shard, k_local)
    elif method == "blockmax":
        # blockmax needs tile % block == 0 and a tile that exists even for
        # tiny shards
        bt = max(32, (min(tile * 4, 65536) // 32) * 32)
        vals, ids = mips_topk_blockmax(queries, corpus_shard, k_local,
                                       tile=bt)
    elif method == "refined":
        vals, ids = mips_topk_refined(queries, corpus_shard, k_local,
                                      tile=tile)
    else:
        vals, ids = mips_topk(
            queries, corpus_shard, k_local, tile=tile, approx=approx,
            exact_fp32=exact_fp32,
        )
    if n_valid is not None:
        pad_hit = ids >= n_valid
        vals = jnp.where(pad_hit, -jnp.inf, vals)
        ids = jnp.where(pad_hit, -1, ids)
    ids = jnp.where(ids >= 0, ids + shard_offset, ids)
    return distributed_topk(vals, ids, k, axis_name)


def mips_topk_sharded(queries, corpus, k: int, mesh, q_chunk: int = 4096,
                      tile: int = 16384, exact_fp32: bool = False,
                      method: str = "auto"):
    """Host-level sharded exact search: corpus rows sharded over the mesh
    data axis, per-shard top-k, cross-shard merge on device. The TPU-native
    replacement for the reference's per-rank FAISS + pickled merge
    (ANCE/utils/eval_mrr.py:231-261). Returns host (vals [Q,k], ids [Q,k]).
    """
    import numpy as np
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cocodr_tpu.core.mesh import DATA_AXIS

    n_data = mesh.shape[DATA_AXIS]
    N = corpus.shape[0]
    k = min(k, N)
    pad = (-N) % n_data
    if pad:
        corpus = np.concatenate(
            [corpus, np.repeat(corpus[-1:], pad, axis=0)]
        )
    shard = corpus.shape[0] // n_data
    corpus_dev = jax.device_put(
        jnp.asarray(corpus), NamedSharding(mesh, P(DATA_AXIS))
    )

    def search(q, c):
        idx = jax.lax.axis_index(DATA_AXIS)
        off = idx * shard
        # only the final shard carries padding rows
        n_valid = jnp.where(idx == n_data - 1, shard - pad, shard)
        return sharded_mips_topk(
            q, c, off, k, DATA_AXIS, tile=min(tile, shard),
            exact_fp32=exact_fp32, n_valid=n_valid, method=method,
            k_local=k + pad,
        )

    f = jax.jit(
        shard_map(
            search,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=(P(), P()),
        )
    )
    out_v, out_i = [], []
    for s in range(0, queries.shape[0], q_chunk):
        v, i = f(jnp.asarray(queries[s : s + q_chunk]), corpus_dev)
        out_v.append(np.asarray(v))
        out_i.append(np.asarray(i))
    return np.concatenate(out_v), np.concatenate(out_i)


def search_topk(queries, corpus, k: int, mesh=None, q_chunk: int = 4096,
                tile: int = 16384, exact_fp32: bool = False,
                method: str = "auto", ivf_index=None, ivf_nprobe: int = 32,
                n_real: int = 0):
    """Mesh-aware search dispatch for the mining/eval pipelines: sharded
    cross-device search when a >1-device data mesh is given, single-device
    (pallas on TPU) otherwise.

    method='ivf': clustered approximate search (ops/ivf.py — the FAISS
    IndexIVFFlat role). Pass a prebuilt `ivf_index` to amortize the
    k-means build across calls on the same corpus (the miner searches
    dev + train queries per round); otherwise one is built here.
    Single-device only — a >1-device mesh falls back to the sharded
    exact path (per-chip corpora shard in flat layout already)."""
    from cocodr_tpu.core.mesh import DATA_AXIS
    from cocodr_tpu.ops.mips import mips_topk_chunked_queries

    sharded = mesh is not None and mesh.shape[DATA_AXIS] > 1
    if method == "ivf" and not sharded and not exact_fp32:
        import jax.numpy as jnp

        from cocodr_tpu.ops.ivf import build_ivf_index, ivf_topk_chunked

        if ivf_index is None:
            ivf_index = build_ivf_index(corpus, dtype=jnp.bfloat16)
        return ivf_topk_chunked(
            queries, ivf_index, k, nprobe=ivf_nprobe, q_chunk=q_chunk
        )
    if method == "ivf":
        method = "auto"  # sharded / fp32-parity calls: exact fallback
    if sharded:
        return mips_topk_sharded(
            queries, corpus, k, mesh, q_chunk=q_chunk, tile=tile,
            exact_fp32=exact_fp32, method=method,
        )
    return mips_topk_chunked_queries(
        queries, corpus, k, q_chunk=q_chunk, tile=tile,
        exact_fp32=exact_fp32, method=method, n_real=n_real,
    )
