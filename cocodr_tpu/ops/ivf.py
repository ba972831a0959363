"""IVF-style clustered approximate MIPS — the FAISS `IndexIVFFlat`
capability (reference evaluate/evaluation/evaluate_beir.py builds flat
indexes; FAISS users reach for IVF at corpus scale) redesigned for TPU.

GPU-FAISS IVF walks variable-length posting lists per query. That shape
is hostile to XLA (dynamic sizes, scalar chasing), so the design here is
block-granular and matmul-first:

  * Build: k-means centroids (ops/kmeans.py — one [N, C] matmul per Lloyd
    step), docs bucketed by nearest centroid, each cluster's rows packed
    into fixed-size BLOCKS of `block_size` rows ([n_blocks, m, D] device
    array). Oversized clusters simply span several blocks; the last
    block of each cluster is zero-padded and its pad rows carry id -1.
  * Probe: score queries against centroids (one small matmul), take
    top-`nprobe` clusters per query. For score(q,d) = q·(c + r) the
    first-order cluster ranking is q·c, so probing maximizes the MIPS
    objective directly (no L2 detour).
  * Invert ON HOST: turn the [Q, nprobe] probe table into fixed-shape
    scoring TASKS (block_idx, query-group of `q_group` queries). The
    inversion is O(Q·nprobe) integer work (~ms); shapes are padded to
    power-of-two buckets so recompilation stops after the first call.
  * Score ON DEVICE: one batched einsum [T,g,D]x[T,m,D] -> [T,g,m] (MXU),
    pad rows masked to -inf, local top-k per (task, slot), then a
    per-query gather of its candidate lists and one final top-k merge.

Every block is read at most once per query-group that probes it, so HBM
traffic approaches (probed fraction of corpus) x bytes — the IVF win on
TPU is bandwidth, not just FLOPs. Exactness: nprobe == n_clusters scans
everything and must equal the flat search (tested); recall at small
nprobe is the usual IVF tradeoff, tunable per call.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cocodr_tpu.ops.kmeans import kmeans


def _ceil_to(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _pow2_bucket(n: int, floor: int = 16) -> int:
    b = floor
    while b < n:
        b *= 2
    return b


@dataclasses.dataclass
class IvfIndex:
    """Cluster-bucketed corpus. Device state is three arrays; the
    host keeps the centroid->blocks table for probe inversion."""

    centroids: jnp.ndarray        # [C, D] f32, device
    blocks: jnp.ndarray           # [n_blocks, m, D] dtype, device
    block_ids: jnp.ndarray        # [n_blocks, m] int32, -1 = pad, device
    centroid_block_rows: np.ndarray  # [C, b_max] int32 block idx, -1 pad (host)
    n_docs: int
    block_size: int

    @property
    def n_clusters(self) -> int:
        return self.centroids.shape[0]

    @property
    def n_blocks(self) -> int:
        return self.blocks.shape[0]


def build_ivf_index(
    corpus,
    n_clusters: Optional[int] = None,
    block_size: int = 512,
    train_sample: int = 262_144,
    kmeans_iters: int = 20,
    seed: int = 0,
    dtype=None,
) -> IvfIndex:
    """Cluster + bucket a corpus. `corpus` may be host numpy (uploaded
    once, already cast to `dtype`) or a device array (no upload). All
    heavy data movement — the k-means sample gather, the chunked
    assignment sweep, and the block-layout gather — runs ON DEVICE; the
    only device->host traffic is the [N] int32 assignment vector, and the
    bucketing itself is pure integer work. (A first build that staged
    everything through host numpy on this environment's single CPU core
    took ~7 min at 1M x 768; this layout builds in seconds.)

    Defaults: n_clusters ~ N/(2*block_size) keeps the average cluster at
    ~2 blocks — padding waste measured ~20% at 1M docs."""
    if dtype is None:
        dtype = corpus.dtype
    # device-resident build needs corpus + blocks co-resident (~2.2x
    # corpus bytes with padding); past ~half of one v5e's HBM, stage the
    # block gather through host numpy instead (slower, no HBM spike)
    n, d = corpus.shape
    itemsize = jnp.zeros((), dtype).dtype.itemsize
    host_stage = n * d * itemsize * 2.3 > 12 * (1 << 30)
    if isinstance(corpus, jax.Array):
        corpus_dev = corpus.astype(dtype)
    elif host_stage:
        corpus_dev = None
    else:
        corpus_dev = jax.device_put(jnp.asarray(np.asarray(corpus), dtype))
    if n_clusters is None:
        n_clusters = max(4, n // (2 * block_size))
    # train on a sample (k-means cost is [S, C] matmuls per iter)
    rng = np.random.RandomState(seed)
    if n > train_sample:
        sel = np.sort(rng.choice(n, train_sample, replace=False))
        if corpus_dev is not None:
            sample = jnp.take(corpus_dev, jnp.asarray(sel), axis=0)
        else:
            sample = jnp.asarray(np.asarray(corpus)[sel], dtype)
    else:
        sample = (corpus_dev if corpus_dev is not None
                  else jnp.asarray(np.asarray(corpus), dtype))
    centroids, _ = kmeans(
        sample.astype(jnp.float32), n_clusters,
        n_iter=kmeans_iters, seed=seed,
    )

    # assign the full corpus in device-side chunks ([chunk, C] f32 distance
    # matrix stays ~256MB); bf16 corpus rounding only fuzzes bucket
    # boundaries — correctness never depends on the assignment
    def _assign_chunk(x, c):
        x = x.astype(jnp.float32)
        d2 = (
            jnp.sum(jnp.square(x), 1, keepdims=True)
            - 2.0 * jnp.matmul(x, c.T, preferred_element_type=jnp.float32)
            + jnp.sum(jnp.square(c), 1)[None, :]
        )
        return jnp.argmin(d2, axis=1)

    assign = jax.jit(_assign_chunk)
    chunk = max(8, (1 << 26) // max(n_clusters, 1))
    chunk = _ceil_to(min(chunk, n), 8)
    ids = np.empty(n, np.int32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        if corpus_dev is not None:
            x = corpus_dev[s:e]
        else:
            x = jnp.asarray(np.asarray(corpus)[s:e], dtype)
        ids[s:e] = np.asarray(assign(x, centroids))[: e - s]
    # host bucketing: stable sort by cluster, split into fixed blocks —
    # integer work on [N] arrays only
    order = np.argsort(ids, kind="stable").astype(np.int64)
    sorted_ids = ids[order]
    counts = np.bincount(sorted_ids, minlength=n_clusters)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    blocks_per_c = np.maximum(1, (counts + block_size - 1) // block_size)
    n_blocks = int(blocks_per_c.sum())
    b_max = int(blocks_per_c.max())
    m = block_size
    block_doc_ids = np.full((n_blocks, m), -1, np.int64)
    centroid_block_rows = np.full((n_clusters, b_max), -1, np.int32)
    b = 0
    for c in range(n_clusters):
        s, cnt = int(starts[c]), int(counts[c])
        for j in range(int(blocks_per_c[c])):
            take = order[s + j * m: s + min((j + 1) * m, cnt)]
            block_doc_ids[b, : len(take)] = take
            centroid_block_rows[c, j] = b
            b += 1
    # block layout gather — on device when the corpus fits alongside the
    # blocks, through host numpy otherwise; pad rows zeroed (and masked
    # to -inf at query time via block_ids)
    gather_ids = np.where(block_doc_ids >= 0, block_doc_ids, 0)
    if corpus_dev is not None:
        pad_mask = jnp.asarray(block_doc_ids < 0)
        blocks = jnp.take(
            corpus_dev, jnp.asarray(gather_ids.reshape(-1)), axis=0
        ).reshape(n_blocks, m, d)
        blocks = jnp.where(
            pad_mask[:, :, None], jnp.zeros((), dtype), blocks
        )
    else:
        corpus_np = np.asarray(corpus)
        blocks_np = corpus_np[gather_ids.reshape(-1)].reshape(
            n_blocks, m, d
        )
        blocks_np[block_doc_ids < 0] = 0
        blocks = jnp.asarray(blocks_np, dtype)
    return IvfIndex(
        centroids=centroids,
        blocks=jax.device_put(blocks),
        block_ids=jax.device_put(block_doc_ids.astype(np.int32)),
        centroid_block_rows=centroid_block_rows,
        n_docs=n,
        block_size=m,
    )


@functools.partial(jax.jit, static_argnames=("nprobe",))
def _probe(queries, centroids, nprobe: int):
    s = jnp.matmul(
        jnp.asarray(queries, jnp.float32), centroids.T,
        preferred_element_type=jnp.float32,
    )
    _, top = jax.lax.top_k(s, nprobe)
    return top


def _invert_probes(
    probes: np.ndarray,               # [Q, nprobe] centroid ids
    centroid_block_rows: np.ndarray,  # [C, b_max]
    q_group: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Host inversion: probe table -> (task_block [T], task_queries [T, g],
    qmap [Q, L]) where qmap lists each query's (task*g + slot) candidate
    rows (-1 pad). Pure integer work, O(Q*nprobe*avg_blocks)."""
    n_q, nprobe = probes.shape
    # queries per centroid
    per_c: dict = {}
    for q in range(n_q):
        for c in probes[q]:
            per_c.setdefault(int(c), []).append(q)
    task_block, task_queries = [], []
    q_lists: list = [[] for _ in range(n_q)]
    for c, qs in per_c.items():
        rows = centroid_block_rows[c]
        rows = rows[rows >= 0]
        for g0 in range(0, len(qs), q_group):
            grp = qs[g0: g0 + q_group]
            for blk in rows:
                t = len(task_block)
                task_block.append(int(blk))
                task_queries.append(grp + [0] * (q_group - len(grp)))
                for slot, q in enumerate(grp):
                    q_lists[q].append(t * q_group + slot)
    n_lists = max(len(l) for l in q_lists)
    qmap = np.full((n_q, n_lists), -1, np.int32)
    for q, l in enumerate(q_lists):
        qmap[q, : len(l)] = l
    return (
        np.asarray(task_block, np.int32),
        np.asarray(task_queries, np.int32),
        qmap,
        len(task_block),
    )


@functools.partial(jax.jit, static_argnames=("k",))
def _score_and_merge(
    queries, blocks, block_ids, task_block, task_queries, qmap, k: int
):
    """[T] tasks -> per-(task,slot) local top-k -> per-query merged top-k.
    All shapes static; pad tasks point at block 0 with all-pad qmap rows,
    so their scores never reach a real query's merge."""
    q = queries[task_queries]                      # [T, g, D]
    d = blocks[task_block]                         # [T, m, D]
    s = jnp.einsum(
        "tgd,tmd->tgm", q, d, preferred_element_type=jnp.float32
    )
    ids = block_ids[task_block]                    # [T, m]
    s = jnp.where((ids < 0)[:, None, :], -jnp.inf, s)
    kk = min(k, s.shape[-1])
    lv, li = jax.lax.top_k(s, kk)                  # [T, g, kk]
    lids = jnp.take_along_axis(
        jnp.broadcast_to(ids[:, None, :], s.shape), li, axis=-1
    )                                              # [T, g, kk]
    t, g = lv.shape[0], lv.shape[1]
    flat_v = lv.reshape(t * g, kk)
    flat_i = lids.reshape(t * g, kk)
    safe = jnp.maximum(qmap, 0)                    # [Q, L]
    cv = flat_v[safe]                              # [Q, L, kk]
    ci = flat_i[safe]
    cv = jnp.where((qmap < 0)[:, :, None], -jnp.inf, cv)
    n_q = qmap.shape[0]
    cv = cv.reshape(n_q, -1)
    ci = ci.reshape(n_q, -1)
    vals, pos = jax.lax.top_k(cv, k)
    out_ids = jnp.take_along_axis(ci, pos, axis=1)
    return vals, out_ids


def ivf_topk(
    queries,
    index: IvfIndex,
    k: int,
    nprobe: int = 32,
    q_group: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate top-k over an IvfIndex. Returns (vals [Q, k] f32,
    ids [Q, k] int32; ids may be -1 if fewer than k docs were probed).

    The probe table comes back to host (Q*nprobe int32 — ~100KB), the
    inversion builds fixed-shape tasks, and one jitted call scores and
    merges. Task/list counts are padded to power-of-two buckets so the
    jit cache stays warm across calls."""
    queries = jnp.asarray(queries)
    nprobe = min(nprobe, index.n_clusters)
    probes = np.asarray(_probe(queries, index.centroids, nprobe))
    task_block, task_queries, qmap, n_t = _invert_probes(
        probes, index.centroid_block_rows, q_group
    )
    tb = _pow2_bucket(n_t)
    pad_t = tb - n_t
    if pad_t:
        task_block = np.concatenate([task_block, np.zeros(pad_t, np.int32)])
        task_queries = np.concatenate(
            [task_queries, np.zeros((pad_t, q_group), np.int32)]
        )
    lb = _pow2_bucket(qmap.shape[1], floor=8)
    if lb > qmap.shape[1]:
        qmap = np.concatenate(
            [qmap, np.full((qmap.shape[0], lb - qmap.shape[1]), -1, np.int32)],
            axis=1,
        )
    vals, ids = _score_and_merge(
        queries.astype(index.blocks.dtype),
        index.blocks,
        index.block_ids,
        jnp.asarray(task_block),
        jnp.asarray(task_queries),
        jnp.asarray(qmap),
        k,
    )
    ids = jnp.where(jnp.isfinite(vals), ids, -1)
    return vals, ids


def ivf_topk_chunked(
    queries,
    index: IvfIndex,
    k: int,
    nprobe: int = 32,
    q_chunk: int = 4096,
    q_group: int = 16,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host loop over query chunks (the mining pipelines search 100k+
    queries per round; per-chunk state stays bounded). Returns numpy."""
    queries = np.asarray(queries)
    vals, ids = [], []
    for s in range(0, len(queries), q_chunk):
        v, i = ivf_topk(
            queries[s: s + q_chunk], index, k,
            nprobe=nprobe, q_group=q_group,
        )
        vals.append(np.asarray(v))
        ids.append(np.asarray(i))
    return np.concatenate(vals), np.concatenate(ids)
