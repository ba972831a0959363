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
    objective directly (no L2 detour); docs are assigned with the SAME
    inner-product metric (FAISS IP-IVF quantizer semantics).
  * Invert ON HOST: turn the [Q, nprobe] probe table into fixed-shape
    scoring TASKS (block_idx, query-group of `q_group` queries). The
    inversion is vectorized numpy segment work (one sort over Q·nprobe
    pairs, a loop only over unique probed centroids); shapes are padded
    to power-of-two buckets so recompilation stops after the first call.
  * Score ON DEVICE: batched einsum [T,g,D]x[T,m,D] -> [T,g,m] (MXU) over
    bounded task SLABS (the gathered block operand stays under a fixed
    HBM budget), pad rows masked to -inf, local top-k per (task, slot),
    then a per-query gather of its candidate lists and a final top-k.

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


def _assign_chunk(x, c):
    """Doc -> cluster assignment by INNER PRODUCT — the same metric as
    query-time probing, like FAISS's IP IVF (quantizer = IndexFlatIP).
    With L2-argmin assignment, high-norm/high-IP docs strand in clusters
    that IP probing ranks low, degrading recall at small nprobe on the
    unnormalized rdot embeddings this repo targets (measured on
    heavy-tailed norms: recall@20 0.926 -> 0.969 at nprobe=8, 0.864 ->
    0.925 at nprobe=4 — scripts/ab_ivf_assign_metric.py)."""
    x = x.astype(jnp.float32)
    ip = jnp.matmul(x, c.T, preferred_element_type=jnp.float32)
    return jnp.argmax(ip, axis=1)


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
    # block gather through host numpy instead (slower, no HBM spike).
    # The guard applies to device-resident corpora too: a large jax.Array
    # input is pulled back to host once rather than doubling HBM.
    n, d = corpus.shape
    itemsize = jnp.zeros((), dtype).dtype.itemsize
    host_stage = n * d * itemsize * 2.3 > 12 * (1 << 30)
    if host_stage:
        if isinstance(corpus, jax.Array):
            corpus = np.asarray(corpus)
        corpus_dev = None
    elif isinstance(corpus, jax.Array):
        corpus_dev = corpus if corpus.dtype == dtype else corpus.astype(dtype)
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

    # assign the full corpus in device-side chunks ([chunk, C] f32 score
    # matrix stays ~256MB); bf16 corpus rounding only fuzzes bucket
    # boundaries — correctness never depends on the assignment
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
    rows (-1 pad).

    Vectorized: one stable sort groups the [Q*nprobe] probe pairs by
    centroid; the python loop runs only over UNIQUE probed centroids
    (<= n_clusters, ~1k at 1M docs) with numpy segment ops inside —
    vs the naive O(Q*nprobe*blocks) per-pair interpreter loop
    (~hundreds of ms per 4k-query chunk on this 1-core host)."""
    n_q, nprobe = probes.shape
    g = q_group
    flat_c = probes.ravel().astype(np.int64)
    flat_q = np.repeat(np.arange(n_q, dtype=np.int64), nprobe)
    order = np.argsort(flat_c, kind="stable")
    sq = flat_q[order]
    uniq, u_start, u_count = np.unique(
        flat_c[order], return_index=True, return_counts=True
    )

    task_block_parts, task_queries_parts = [], []
    entry_q_parts, entry_row_parts = [], []
    t0 = 0
    for c, s, cnt in zip(uniq, u_start, u_count):
        qs = sq[s: s + cnt]
        rows = centroid_block_rows[c]
        rows = rows[rows >= 0]
        b_c = len(rows)
        n_g = -(-int(cnt) // g)
        qs_pad = np.concatenate([qs, np.zeros(n_g * g - cnt, np.int64)])
        # task t0 + j*b_c + i scores group j against block rows[i]
        task_block_parts.append(np.tile(rows, n_g))
        task_queries_parts.append(
            np.repeat(qs_pad.reshape(n_g, g), b_c, axis=0)
        )
        # pair (query at rank r in this centroid) -> group j = r//g,
        # slot = r%g, candidate rows (t0 + j*b_c + [0..b_c))*g + slot
        r = np.arange(cnt)
        base = (t0 + (r // g) * b_c)[:, None] + np.arange(b_c)[None, :]
        entry_row_parts.append((base * g + (r % g)[:, None]).ravel())
        entry_q_parts.append(np.repeat(qs, b_c))
        t0 += n_g * b_c
    n_t = t0
    if n_t == 0:
        return (
            np.zeros(0, np.int32), np.zeros((0, g), np.int32),
            np.full((n_q, 1), -1, np.int32), 0,
        )
    task_block = np.concatenate(task_block_parts).astype(np.int32)
    task_queries = np.concatenate(task_queries_parts).astype(np.int32)
    entry_q = np.concatenate(entry_q_parts)
    entry_row = np.concatenate(entry_row_parts)
    # bucket entries by query -> qmap [Q, L]
    counts_q = np.bincount(entry_q, minlength=n_q)
    qmap = np.full((n_q, int(counts_q.max())), -1, np.int32)
    eorder = np.argsort(entry_q, kind="stable")
    eq, er = entry_q[eorder], entry_row[eorder]
    seg_start = np.concatenate([[0], np.cumsum(counts_q)[:-1]])
    pos = np.arange(len(eq)) - seg_start[eq]
    qmap[eq, pos] = er
    return task_block, task_queries, qmap, n_t


def _score_one_slab(queries, blocks, block_ids, task_block, task_queries,
                    k: int):
    """One task slab: gather blocks, score, per-(task,slot) local top-k.
    Returns (flat_v, flat_i) [T_slab*g, kk]. The slab bound keeps the
    gathered [T_slab, m, D] operand to a fixed HBM budget — an unbounded
    T materializes (tasks x block) bytes, ~13GB at mining scale
    (q_chunk=4096, nprobe=32, 1M docs)."""
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
    return lv.reshape(t * g, kk), lids.reshape(t * g, kk)


@functools.partial(jax.jit, static_argnames=("k",))
def _score_and_merge(queries, blocks, block_ids, task_block, task_queries,
                     qmap, k: int):
    """ONE device program for the whole post-probe search: a lax.scan over
    task slabs (each iteration gathers one bounded block operand) followed
    by the per-query merge. A host loop over slabs pays a dispatch round
    trip per slab — ~250ms each over the axon tunnel, which dominated the
    whole search (scripts/curve_ivf_serve.py history); the scan keeps the
    slab memory bound at one dispatch total.

    task_block [ns, slab], task_queries [ns, slab, g]; pad tasks point at
    block 0 with no qmap row referencing them."""
    def body(_, inp):
        tb, tq = inp
        return None, _score_one_slab(queries, blocks, block_ids, tb, tq, k)

    _, (fv, fi) = jax.lax.scan(body, None, (task_block, task_queries))
    ns, rows, kk = fv.shape
    flat_v = fv.reshape(ns * rows, kk)
    flat_i = fi.reshape(ns * rows, kk)
    # per-query gather of its candidate rows and one final top-k
    safe = jnp.maximum(qmap, 0)                    # [Q, L]
    cv = flat_v[safe]                              # [Q, L, kk]
    ci = flat_i[safe]
    cv = jnp.where((qmap < 0)[:, :, None], -jnp.inf, cv)
    n_q = qmap.shape[0]
    cv = cv.reshape(n_q, -1)
    ci = ci.reshape(n_q, -1)
    vals, pos = jax.lax.top_k(cv, min(k, cv.shape[1]))
    out_ids = jnp.take_along_axis(ci, pos, axis=1)
    if vals.shape[1] < k:  # fewer probed candidates than k
        pad = k - vals.shape[1]
        vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        out_ids = jnp.pad(out_ids, ((0, 0), (0, pad)), constant_values=-1)
    return vals, out_ids


def _task_slab(index: IvfIndex, budget_bytes: int = 192 * (1 << 20)) -> int:
    """Tasks per _score_tasks call such that the gathered [T, m, D] block
    operand stays under the HBM budget."""
    m, d = index.block_size, index.blocks.shape[-1]
    per_task = m * d * index.blocks.dtype.itemsize
    return max(64, _pow2_bucket(max(64, budget_bytes // per_task)) // 2)


def ivf_topk(
    queries,
    index: IvfIndex,
    k: int,
    nprobe: int = 32,
    q_group: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate top-k over an IvfIndex. Returns (vals [Q, k] f32,
    ids [Q, k] int32; ids may be -1 if fewer than k docs were probed).

    The probe table comes back to host (Q*nprobe int32 — ~100KB), the
    inversion builds fixed-shape tasks, and jitted calls score task slabs
    (bounded HBM per slab) then merge per query. Slab/list shapes are
    padded to fixed buckets so the jit cache stays warm across calls."""
    queries = jnp.asarray(queries)
    if queries.shape[0] == 0:
        return (
            jnp.zeros((0, k), jnp.float32), jnp.zeros((0, k), jnp.int32)
        )
    # larger groups -> fewer tasks -> fewer re-reads of a popular
    # centroid's blocks (HBM) — but never grossly over-pad tiny batches
    q_group = min(q_group, _pow2_bucket(int(queries.shape[0]), floor=8))
    nprobe = min(nprobe, index.n_clusters)
    probes = np.asarray(_probe(queries, index.centroids, nprobe))
    task_block, task_queries, qmap, n_t = _invert_probes(
        probes, index.centroid_block_rows, q_group
    )
    slab = min(_task_slab(index), _pow2_bucket(n_t))
    n_slabs = -(-n_t // slab)
    ns = _pow2_bucket(n_slabs, floor=1)  # bucket the scan length
    pad = ns * slab - n_t
    if pad:  # pad tasks score block 0 for query 0; no qmap row points at
        # them (qmap indexes t*g+slot with t < n_t)
        task_block = np.concatenate([task_block, np.zeros(pad, np.int32)])
        task_queries = np.concatenate(
            [task_queries, np.zeros((pad, q_group), np.int32)]
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
        jnp.asarray(task_block.reshape(ns, slab)),
        jnp.asarray(task_queries.reshape(ns, slab, q_group)),
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
    q_group: int = 64,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host loop over query chunks (the mining pipelines search 100k+
    queries per round; per-chunk state stays bounded). Returns numpy."""
    queries = np.asarray(queries)
    if len(queries) == 0:
        return (
            np.zeros((0, k), np.float32), np.zeros((0, k), np.int32)
        )
    vals, ids = [], []
    for s in range(0, len(queries), q_chunk):
        v, i = ivf_topk(
            queries[s: s + q_chunk], index, k,
            nprobe=nprobe, q_group=q_group,
        )
        vals.append(np.asarray(v))
        ids.append(np.asarray(i))
    return np.concatenate(vals), np.concatenate(ids)
