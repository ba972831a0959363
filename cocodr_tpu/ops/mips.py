"""Exact brute-force MIPS (maximum inner-product search) on TPU.

Replaces FAISS `IndexFlatIP` + raw-heap `knn_inner_product`
(reference ANCE/drivers/run_ann_data_gen.py:310-317,
evaluate/evaluation/evaluate_beir.py:220-224, ANCE/utils/eval_mrr.py:62-91).

Design: the corpus never materializes a full [Q, N] score matrix. A
`lax.scan` sweeps HBM-resident corpus tiles; each tile's scores come off the
MXU ([Q, T] bf16 matmul, fp32 accumulation), are reduced to a per-tile top-k,
and merged into the running top-k — O(Q*(K+K')) state, one corpus read.

Sharding: under pjit, shard the corpus over the mesh data axis and run this
per shard; merge shard results with parallel.topk.distributed_topk. Queries
can also be tiled (vmap/scan outer loop) for very large Q.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _merge_topk(run_vals, run_ids, new_vals, new_ids, k):
    """Merge two (vals, ids) candidate sets, keep top-k by value."""
    vals = jnp.concatenate([run_vals, new_vals], axis=1)
    ids = jnp.concatenate([run_ids, new_ids], axis=1)
    top_vals, pos = jax.lax.top_k(vals, k)
    top_ids = jnp.take_along_axis(ids, pos, axis=1)
    return top_vals, top_ids


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "approx", "recall_target")
)
def mips_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    tile: int = 16384,
    approx: bool = False,
    recall_target: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact (or TPU-PartialReduce approximate) top-k inner-product search.

    queries [Q, D], corpus [N, D] -> (scores [Q, k] desc, indices [Q, k]).
    N is padded to a tile multiple internally; padding scores -inf.
    """
    Q, D = queries.shape
    N = corpus.shape[0]
    k = min(k, N)
    n_tiles = -(-N // tile)
    pad = n_tiles * tile - N
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    corpus_tiles = corpus.reshape(n_tiles, tile, D)

    q32 = queries.astype(jnp.float32)
    kk = min(k, tile)

    def tile_topk(scores):
        if approx:
            return jax.lax.approx_max_k(scores, kk, recall_target=recall_target)
        return jax.lax.top_k(scores, kk)

    def tile_scores(tile_idx, ctile):
        scores = jnp.matmul(
            q32, ctile.astype(jnp.float32).T, preferred_element_type=jnp.float32
        )  # [Q, T]
        # mask padded rows of the final tile
        base = tile_idx * tile
        col_ids = base + jnp.arange(tile, dtype=jnp.int32)[None, :]
        scores = jnp.where(col_ids < N, scores, -jnp.inf)
        t_vals, t_pos = tile_topk(scores)
        return t_vals, base + t_pos.astype(jnp.int32)

    # seed the running top-k from tile 0 (also keeps the scan carry derived
    # from the corpus, which shard_map's varying-axis tracking requires)
    init_vals, init_ids = tile_scores(jnp.int32(0), corpus_tiles[0])
    if kk < k:
        init_vals = jnp.pad(
            init_vals, ((0, 0), (0, k - kk)), constant_values=-jnp.inf
        )
        init_ids = jnp.pad(init_ids, ((0, 0), (0, k - kk)), constant_values=-1)

    def body(carry, inp):
        run_vals, run_ids = carry
        tile_idx, ctile = inp
        t_vals, t_ids = tile_scores(tile_idx, ctile)
        return _merge_topk(run_vals, run_ids, t_vals, t_ids, k), None

    if n_tiles == 1:
        return init_vals, init_ids
    (vals, ids), _ = jax.lax.scan(
        body,
        (init_vals, init_ids),
        (jnp.arange(1, n_tiles, dtype=jnp.int32), corpus_tiles[1:]),
    )
    return vals, ids


def mips_topk_chunked_queries(
    queries, corpus, k, q_chunk: int = 4096, **kw
):
    """Outer loop over query chunks for very large Q (host-level loop —
    each chunk is one jit call; keeps peak memory at Q_chunk*k state)."""
    import numpy as np

    out_v, out_i = [], []
    for s in range(0, queries.shape[0], q_chunk):
        v, i = mips_topk(queries[s : s + q_chunk], corpus, k, **kw)
        out_v.append(np.asarray(v))
        out_i.append(np.asarray(i))
    return np.concatenate(out_v), np.concatenate(out_i)
