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
from typing import Tuple

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
    jax.jit,
    static_argnames=("k", "tile", "approx", "recall_target", "exact_fp32"),
)
def mips_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    tile: int = 16384,
    approx: bool = False,
    recall_target: float = 0.95,
    exact_fp32: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact (or TPU-PartialReduce approximate) top-k inner-product search.

    queries [Q, D], corpus [N, D] -> (scores [Q, k] desc, indices [Q, k]).
    N is padded to a tile multiple internally; padding scores -inf.

    Scores are computed on the MXU in bf16 with fp32 accumulation (the
    TPU-native regime; embeddings round-trip through bf16 with ~3 decimal
    digits, which leaves BEIR/MARCO metrics unchanged — see tests). Pass
    exact_fp32=True to force full fp32 multiplies (FAISS-bit parity mode,
    ~4-8x slower on the MXU).
    """
    Q, D = queries.shape
    N = corpus.shape[0]
    k = min(k, N)
    n_tiles = -(-N // tile)
    pad = n_tiles * tile - N
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    corpus_tiles = corpus.reshape(n_tiles, tile, D)

    mm_dtype = jnp.float32 if exact_fp32 else jnp.bfloat16
    q32 = queries.astype(mm_dtype)
    kk = min(k, tile)

    def tile_topk(scores):
        if approx:
            return jax.lax.approx_max_k(scores, kk, recall_target=recall_target)
        return jax.lax.top_k(scores, kk)

    def tile_scores(tile_idx, ctile):
        scores = jnp.matmul(
            q32, ctile.astype(mm_dtype).T, preferred_element_type=jnp.float32
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


@functools.partial(jax.jit, static_argnames=("k", "dtype", "q_chunk"))
def rescore_topk(queries, corpus, cand_ids, k, dtype=jnp.float32,
                 q_chunk: int = 128):
    """Rescore per-query candidate sets -> final top-k.

    queries [Q, D]; cand_ids [Q, K'] corpus offsets (may contain -1 padding).
    dtype: multiply dtype (bf16 to stay consistent with a bf16 sweep, fp32
    for exact final ordering); accumulation is always fp32. The candidate
    gather runs in query chunks (lax.map) to bound the [chunk, K', D]
    gather buffer.
    """
    Q, D = queries.shape
    Kp = cand_ids.shape[1]
    n_chunks = -(-Q // q_chunk)
    pad = n_chunks * q_chunk - Q
    q_p = jnp.pad(queries, ((0, pad), (0, 0)))
    c_p = jnp.pad(cand_ids, ((0, pad), (0, 0)), constant_values=-1)

    def one(args):
        qc, cc = args
        qq = qc.astype(dtype)
        cand = corpus[jnp.maximum(cc, 0)].astype(dtype)  # [C, K', D]
        scores = jnp.einsum(
            "qd,qkd->qk", qq, cand, preferred_element_type=jnp.float32
        )
        scores = jnp.where(cc >= 0, scores, -jnp.inf)
        vals, pos = jax.lax.top_k(scores, k)
        return vals, jnp.take_along_axis(cc, pos, axis=1)

    vals, ids = jax.lax.map(
        one,
        (
            q_p.reshape(n_chunks, q_chunk, D),
            c_p.reshape(n_chunks, q_chunk, Kp),
        ),
    )
    return vals.reshape(-1, k)[:Q], ids.reshape(-1, k)[:Q]


_rescore_fp32 = rescore_topk  # backward-compat alias


def mips_topk_refined(
    queries,
    corpus,
    k: int,
    oversample: int = 2,
    tile: int = 16384,
    approx: bool = False,
):
    """Two-phase exact-in-practice search: bf16 MXU sweep keeps
    oversample*k candidates per query (immune to all but sub-bf16-resolution
    misses), then an fp32 rescore of the candidates restores exact ordering.
    This is the recommended eval/mining mode: MXU-speed sweep, fp32 metrics.
    """
    kk = min(oversample * k, corpus.shape[0])
    _, cand = mips_topk(queries, corpus, kk, tile=tile, approx=approx)
    return _rescore_fp32(queries, corpus, cand, min(k, kk))


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "block", "rescore_chunk")
)
def mips_topk_blockmax(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    tile: int = 65536,
    block: int = 32,
    rescore_chunk: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """EXACT two-level top-k — the fast path replacing per-tile sorts.

    Phase 1 sweeps corpus tiles computing only per-BLOCK maxima of the
    (bf16-input, fp32-accumulated) scores: no sorting in the sweep at all.
    Phase 2 takes ONE top-k over the [Q, N/block] maxima. Exactness: any
    true top-k item's block has max >= the global k-th score, and fewer than
    k blocks can have max above it, so the top-k blocks always contain every
    top-k item. Phase 3 gathers the k*block candidates and rescores them
    with the same score function, restoring exact per-item order.

    Complexity per sweep: matmul (MXU) + O(QN) VPU max + ONE sort of N/block
    per query — vs. N/tile sorts of `tile` in the naive path (this is where
    the reference's FAISS heap time went; on TPU the sort was 95%+ of the
    naive sweep).
    """
    Q, D = queries.shape
    N = corpus.shape[0]
    k = min(k, N)
    n_tiles = -(-N // tile)
    pad = n_tiles * tile - N
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    corpus_tiles = corpus.reshape(n_tiles, tile, D)
    n_blocks_per_tile = tile // block

    qq = queries.astype(jnp.bfloat16)

    def body(_, inp):
        tile_idx, ctile = inp
        scores = jnp.matmul(
            qq, ctile.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
        base = tile_idx * tile
        col = base + jnp.arange(tile, dtype=jnp.int32)[None, :]
        scores = jnp.where(col < N, scores, -jnp.inf)
        bm = jnp.max(
            scores.reshape(Q, n_blocks_per_tile, block), axis=-1
        )  # [Q, T/block]
        return None, bm

    _, bms = jax.lax.scan(
        body,
        None,
        (jnp.arange(n_tiles, dtype=jnp.int32), corpus_tiles),
    )  # [n_tiles, Q, T/block]
    bm_all = jnp.moveaxis(bms, 0, 1).reshape(Q, n_tiles * n_blocks_per_tile)

    kb = min(k, bm_all.shape[1])
    _, block_ids = jax.lax.top_k(bm_all, kb)  # [Q, kb]

    cand = (
        block_ids[:, :, None] * block
        + jnp.arange(block, dtype=jnp.int32)[None, None, :]
    ).reshape(Q, kb * block)
    cand = jnp.where(cand < N, cand, -1)

    # Phase 3: gather + rescore in query chunks to bound gather memory.
    n_q_chunks = -(-Q // rescore_chunk)
    qpad = n_q_chunks * rescore_chunk - Q
    q_p = jnp.pad(queries, ((0, qpad), (0, 0)))
    c_p = jnp.pad(cand, ((0, qpad), (0, 0)), constant_values=-1)

    def rescore(args):
        qc, cc = args  # [C, D], [C, kb*block]
        rows = corpus[jnp.maximum(cc, 0)].astype(jnp.bfloat16)  # [C, KB, D]
        s = jnp.einsum(
            "qd,qkd->qk",
            qc.astype(jnp.bfloat16),
            rows,
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(cc >= 0, s, -jnp.inf)
        v, pos = jax.lax.top_k(s, k)
        i = jnp.take_along_axis(cc, pos, axis=1)
        return v, i

    vals, ids = jax.lax.map(
        rescore,
        (
            q_p.reshape(n_q_chunks, rescore_chunk, D),
            c_p.reshape(n_q_chunks, rescore_chunk, -1),
        ),
    )
    return (
        vals.reshape(-1, k)[:Q],
        ids.reshape(-1, k)[:Q],
    )


def _tpu_like_backend() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


SEARCH_METHODS = (
    "auto", "pallas", "exact2", "fast", "blockmax", "refined", "naive",
)


def resolve_search_method(method: str, refine: bool = True,
                          exact_fp32: bool = False) -> str:
    """One method-resolution rule for the single-device AND sharded search
    dispatchers: validate, force 'naive' under exact_fp32, resolve 'auto'
    by backend, and fall back to the exact XLA path where Mosaic kernels
    are unavailable."""
    if method not in SEARCH_METHODS:
        raise ValueError(
            f"method must be one of {SEARCH_METHODS}, got {method!r}"
        )
    if exact_fp32:
        return "naive"
    if method == "auto":
        method = (
            "pallas" if _tpu_like_backend()
            else ("refined" if refine else "blockmax")
        )
    if method in ("pallas", "exact2", "fast") and not _tpu_like_backend():
        return "blockmax"
    return method


def clamp_q_chunk(q_chunk: int, n_docs: int, dim: int,
                  hbm_budget: int = 15_000_000_000) -> int:
    """Scale-aware query-chunk clamp for the pallas search kernels.

    The hierarchical/fast kernels keep per-query fine/coarse block maxima
    of ~n_docs/2 bytes per query alongside the bf16 corpus. At MARCO
    scale that buffer dominates: q_chunk=4096 over 8.8M docs asks for a
    36GB f32[17272, 4096, 64] maxima tensor and the compile OOMs
    (device-observed, round-5 rehearsal — scripts/rehearse_marco_mine.py)
    while q_chunk=256 runs at 6.7k QPS (scripts/bench_marco_scale.py).
    Clamp so corpus + maxima fit the budget; multiples of 128, floor 128.
    Small corpora are unaffected (1M docs -> no clamp at 4096)."""
    free = hbm_budget - n_docs * dim * 2
    q_fit = int(free // max(n_docs // 2, 1))
    q_fit = max(128, (q_fit // 128) * 128)
    return min(q_chunk, q_fit)


def mips_topk_chunked_queries(
    queries, corpus, k, q_chunk: int = 4096, refine: bool = True,
    oversample: int = 2, method: str = "auto", n_real: int = 0, **kw
):
    """Outer loop over query chunks for very large Q (host-level loop —
    each chunk is one jit call; keeps peak memory at Q_chunk*k state).

    method:
      'auto'     — pallas hierarchical kernel on TPU backends, XLA block-max
                   elsewhere (both exact);
      'pallas'   — force the pallas hierarchical kernel;
      'exact2'   — pallas argmax-certificate exact search (top-2 coarse
                   sweep, near-zero rescore; falls back to 'pallas' when
                   the on-device certificate fails — see
                   pallas_mips.mips_topk_exact2);
      'fast'     — pallas rescore-free block-argmax mode (~1.25x faster,
                   ~99.7% recall@100; see pallas_mips.mips_topk_fast);
      'blockmax' — force the XLA block-max path;
      'refined'  — bf16 sweep + fp32 candidate rescore (XLA);
      'naive'    — per-tile sort sweep (reference-style; also the
                   exact_fp32 path).
    """
    import numpy as np

    method = resolve_search_method(
        method, refine=refine, exact_fp32=bool(kw.get("exact_fp32"))
    )
    if method in ("pallas", "exact2", "fast"):
        q_chunk = clamp_q_chunk(q_chunk, corpus.shape[0], corpus.shape[1])

    out_v, out_i = [], []
    for s in range(0, queries.shape[0], q_chunk):
        qc = queries[s : s + q_chunk]
        if method == "pallas":
            from cocodr_tpu.ops.pallas_mips import mips_topk_hierarchical

            v, i = mips_topk_hierarchical(qc, corpus, k, n_real=n_real)
        elif method == "exact2":
            from cocodr_tpu.ops.pallas_mips import mips_topk_exact2

            v, i = mips_topk_exact2(qc, corpus, k)
        elif method == "fast":
            from cocodr_tpu.ops.pallas_mips import mips_topk_fast

            v, i = mips_topk_fast(qc, corpus, k, n_real=n_real)
        elif method == "blockmax":
            v, i = mips_topk_blockmax(
                qc, corpus, k, tile=min(kw.get("tile", 16384) * 4, 65536)
            )
        elif method == "refined":
            v, i = mips_topk_refined(
                qc, corpus, k, oversample=oversample,
                tile=kw.get("tile", 16384), approx=kw.get("approx", False),
            )
        else:  # 'naive'
            v, i = mips_topk(qc, corpus, k, **kw)
        out_v.append(np.asarray(v))
        out_i.append(np.asarray(i))
    return np.concatenate(out_v), np.concatenate(out_i)
