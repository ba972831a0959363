"""Online retrieval serving.

The reference has no serving story (research pipelines only); production
deployment is a first-class goal here. `RetrievalService` holds the corpus
embeddings device-resident (bf16 HBM; ~1.5GB per million 768-d docs on one
v5e) and answers text queries with one jitted encode + the pallas top-k
(exact ~38-41k QPS or rescore-free fast mode ~48-52k QPS @1M docs) —
measured ~1,600 end-to-end queries/s at 1M docs, batch 64, on one chip:
encode + search compile into ONE program per (bucket, top_k), so a query
batch costs a single device dispatch (separate encode/search calls paid
the dispatch round trip twice — 950 q/s). With a mesh the resident corpus shards across chips (cross-
shard merge on ICI; ~70M bf16 768-d docs on a v5e-8), and the int8 mode
doubles per-chip capacity again. CLI: `cocodr_tpu serve` (stdin REPL).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ServeConfig:
    top_k: int = 10
    max_query_len: int = 64
    # queries are padded to a power-of-two bucket (min 8) capped at
    # max_batch, NOT always to max_batch: a 1-query REPL call encodes 8
    # rows, not 64. Each bucket is a separate jit specialization (compiled
    # once, cached); max_batch bounds the compile count and remains the
    # throughput batch for bulk callers.
    max_batch: int = 64
    exact_fp32: bool = False
    # rescore-free block-argmax search (~1.25x lower latency, ~99.7%
    # recall@100 — pallas_mips.mips_topk_fast); ignored with exact_fp32
    fast_search: bool = False
    # int8-quantized corpus: half the HBM (~17M 768-d docs/chip) at the
    # same search latency (pallas_mips.mips_topk_int8); TPU backends only.
    # Single-device mode: with a >1-device mesh the corpus shards in
    # bf16/f32 (mesh capacity already scales linearly; combine the two
    # when per-chip HBM is the binding constraint by quantizing offline)
    quantize_int8: bool = False
    # IVF clustered search (ops/ivf.py): for corpora past the int8
    # ceiling (>16.4M 768-d docs/chip) — only the probed fraction of the
    # corpus is read per query, trading recall (ivf_nprobe knob) for
    # capacity/latency. Single-device, non-fp32 mode. The probe inversion
    # runs on host, so serve calls are two dispatches (encode, score)
    # instead of the fused one; see docs/performance.md for the
    # nprobe -> recall/latency curve at 1M docs.
    ivf: bool = False
    ivf_nprobe: int = 32
    ivf_clusters: Optional[int] = None
    ivf_block_size: int = 512


class RetrievalService:
    def __init__(
        self,
        model,
        params,
        tokenizer,
        corpus_emb: np.ndarray,
        doc_ids: Optional[Sequence] = None,
        cfg: ServeConfig = ServeConfig(),
        mesh=None,
    ):
        """mesh: a >1-device data mesh shards the corpus across chips and
        serves with the cross-shard merge (parallel/topk) — each chip holds
        N/n_chips docs resident, so a v5e-8 serves ~70M bf16 768-d docs.
        The sharded search program is built ONCE here (unlike the offline
        mips_topk_sharded, which re-uploads the corpus per call)."""
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.doc_ids = doc_ids
        self.mesh = None
        self._sharded_search = None
        self._programs = {}
        self.ivf_index = None
        # true corpus size — self.corpus may carry pad rows (sharded mode
        # pads to a multiple of the data axis); report THIS externally
        self.n_docs = int(corpus_emb.shape[0])
        if mesh is not None:
            from cocodr_tpu.core.mesh import DATA_AXIS

            if mesh.shape[DATA_AXIS] > 1:
                self.mesh = mesh
                self._init_sharded(model, params, corpus_emb, mesh)
                return
        if cfg.ivf and not cfg.exact_fp32:
            from cocodr_tpu.ops.ivf import build_ivf_index

            self.ivf_index = build_ivf_index(
                np.asarray(corpus_emb),
                n_clusters=cfg.ivf_clusters,
                block_size=cfg.ivf_block_size,
                dtype=jnp.bfloat16,
            )
            self.corpus = None
            self.dim_scale = None
        elif cfg.quantize_int8 and not cfg.exact_fp32:
            from cocodr_tpu.ops.pallas_mips import quantize_corpus_int8

            c_i8, dim_scale = quantize_corpus_int8(jnp.asarray(corpus_emb))
            self.corpus = jax.device_put(c_i8)
            self.dim_scale = jax.device_put(dim_scale)
        else:
            self.corpus = jax.device_put(
                jnp.asarray(
                    corpus_emb,
                    jnp.float32 if cfg.exact_fp32 else jnp.bfloat16,
                )
            )
            self.dim_scale = None
        self.params = jax.device_put(params)
        self._model = model
        self._encode = jax.jit(
            lambda p, ids, mask: model.apply(
                {"params": p}, ids, mask, method=model.query_emb
            )
        )

    def _program(self, k: int):
        """Fused tokenized-ids -> top-k program: encode + search in ONE
        compiled call, so a query batch costs a single device dispatch
        (the tunnel/dispatch round trip per call dominates small-batch
        serving; separate encode and search calls paid it twice). One jit
        specialization per top_k; query-count buckets specialize within
        jit as usual."""
        prog = self._programs.get(k)
        if prog is not None:
            return prog
        cfg = self.cfg
        model = self._model

        from cocodr_tpu.ops.mips import (
            _tpu_like_backend,
            mips_topk,
            mips_topk_blockmax,
        )

        def fn(p, ids, mask, corpus, dim_scale):
            emb = model.apply(
                {"params": p}, ids, mask, method=model.query_emb
            )
            if cfg.exact_fp32:
                return mips_topk(emb, corpus, k, exact_fp32=True)
            if _tpu_like_backend():
                from cocodr_tpu.ops.pallas_mips import (
                    mips_topk_fast,
                    mips_topk_hierarchical,
                    mips_topk_int8,
                )

                if dim_scale is not None:
                    return mips_topk_int8(emb, corpus, dim_scale, k)
                search = (mips_topk_fast if cfg.fast_search
                          else mips_topk_hierarchical)
                return search(emb, corpus, k)
            if dim_scale is not None:  # dequantize off-TPU (tests)
                corpus = (corpus.astype(jnp.float32)
                          * dim_scale).astype(jnp.bfloat16)
            return mips_topk_blockmax(emb, corpus, k)

        prog = jax.jit(fn, static_argnames=())
        self._programs[k] = prog
        return prog

    def _init_sharded(self, model, params, corpus_emb, mesh):
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cocodr_tpu.core.mesh import DATA_AXIS
        from cocodr_tpu.parallel.topk import sharded_mips_topk

        cfg = self.cfg
        n_data = mesh.shape[DATA_AXIS]
        N = corpus_emb.shape[0]
        pad = (-N) % n_data
        if pad:
            corpus_emb = np.concatenate(
                [corpus_emb, np.repeat(corpus_emb[-1:], pad, axis=0)]
            )
        shard = corpus_emb.shape[0] // n_data
        dtype = jnp.float32 if cfg.exact_fp32 else jnp.bfloat16
        self.corpus = jax.device_put(
            jnp.asarray(corpus_emb, dtype),
            NamedSharding(mesh, P(DATA_AXIS)),
        )
        self.dim_scale = None
        self.params = jax.device_put(params, NamedSharding(mesh, P()))
        self._model = model
        self._encode = jax.jit(
            lambda p, ids, mask: model.apply(
                {"params": p}, ids, mask, method=model.query_emb
            ),
            in_shardings=(NamedSharding(mesh, P()),
                          NamedSharding(mesh, P()),
                          NamedSharding(mesh, P())),
        )
        k = cfg.top_k
        method = "fast" if cfg.fast_search else "auto"

        def search(q, c):
            idx = jax.lax.axis_index(DATA_AXIS)
            off = idx * shard
            n_valid = jnp.where(idx == n_data - 1, shard - pad, shard)
            return sharded_mips_topk(
                q, c, off, k, DATA_AXIS, tile=min(16384, shard),
                exact_fp32=cfg.exact_fp32, n_valid=n_valid, method=method,
                k_local=k + pad,
            )

        sharded_search = shard_map(
            search, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=(P(), P()),
        )

        # one program per query batch here too (cf. _program): replicated
        # encode + sharded search under a single jit — GSPMD partitions
        # both, and a serve call costs one dispatch across the mesh
        def fused(p, ids, mask, c):
            emb = model.apply(
                {"params": p}, ids, mask, method=model.query_emb
            )
            return sharded_search(emb, c)

        self._sharded_search = jax.jit(
            shard_map(
                search, mesh=mesh,
                in_specs=(P(), P(DATA_AXIS)),
                out_specs=(P(), P()),
            )
        )
        self._sharded_program = jax.jit(
            fused,
            in_shardings=(NamedSharding(mesh, P()),
                          NamedSharding(mesh, P()),
                          NamedSharding(mesh, P()),
                          NamedSharding(mesh, P(DATA_AXIS))),
        )

    def _bucket(self, nq: int) -> int:
        """Static batch size for nq queries: next power of two >= nq
        (min 8), capped at max_batch; above max_batch, the next multiple
        of max_batch (bulk callers keep the full-batch program)."""
        cap = self.cfg.max_batch
        if nq >= cap:
            return nq + ((-nq) % cap)
        b = 8
        while b < nq:
            b *= 2
        return min(b, cap)

    def _tokenize(self, texts: List[str]):
        out = self.tokenizer(
            texts,
            padding="max_length",
            truncation=True,
            max_length=self.cfg.max_query_len,
            return_tensors="np",
        )
        return (
            out["input_ids"].astype(np.int32),
            out["attention_mask"].astype(np.int32),
        )

    def search(self, queries: List[str], top_k: Optional[int] = None
               ) -> Tuple[np.ndarray, list]:
        """-> (scores [Q, k], ids [Q, k] — external doc ids if provided)."""
        return self.collect(
            self.dispatch(list(queries), top_k or self.cfg.top_k)
        )

    def collect(self, pending) -> Tuple[np.ndarray, list]:
        """Block on a dispatch() handle and fan results out (one host
        readback round trip)."""
        nq, handles = pending
        vals, idx = jax.device_get(handles)
        return self._external(vals, idx, nq)

    def collect_many(self, pendings) -> list:
        """Block on several dispatch() handles with ONE bulk device_get:
        each readback costs a full host<->device round trip regardless of
        payload size ([batch, k] results are tiny), so collecting
        in-flight batches together costs one round trip instead of one
        per batch (the HTTP reader and search_stream both drain this
        way)."""
        got = jax.device_get([h for _, h in pendings])
        return [
            self._external(v, i, nq)
            for (nq, _), (v, i) in zip(pendings, got)
        ]

    def _external(self, vals, idx, nq):
        vals, idx = vals[:nq], idx[:nq]
        if self.doc_ids is not None:
            ext = [[self.doc_ids[i] if i >= 0 else None for i in row]
                   for row in idx]
        else:
            ext = idx.tolist()
        return vals, ext

    def dispatch(self, queries: List[str], k: int):
        """Enqueue one query batch; returns an opaque pending handle
        without blocking (jax dispatch is async). Pass to collect() —
        callers that keep several dispatches in flight (search_stream,
        the HTTP batcher) overlap device work with readback."""
        nq = len(queries)
        pad = self._bucket(nq) - nq
        ids, mask = self._tokenize(queries + [""] * pad)
        if self._sharded_search is not None:
            assert k <= self.cfg.top_k, "sharded program compiled for top_k"
            vals, idx = self._sharded_program(
                self.params, jnp.asarray(ids), jnp.asarray(mask),
                self.corpus,
            )
            return nq, (vals[:, :k], idx[:, :k])
        if self.ivf_index is not None:
            from cocodr_tpu.ops.ivf import ivf_topk

            emb = self._encode(
                self.params, jnp.asarray(ids), jnp.asarray(mask)
            )
            # the probe inversion host-syncs on the [Q, nprobe] table, so
            # the IVF path is two dispatches (not the fused program) and
            # search_stream's in-flight depth partially serializes here
            return nq, ivf_topk(
                emb, self.ivf_index, k, nprobe=self.cfg.ivf_nprobe
            )
        return nq, self._program(k)(
            self.params, jnp.asarray(ids), jnp.asarray(mask),
            self.corpus, self.dim_scale,
        )

    def search_stream(self, query_batches, top_k: Optional[int] = None,
                      depth: int = 4):
        """Pipelined bulk serving: generator over (scores, ids) per batch.

        search() blocks on every batch — one full dispatch + readback
        round trip each, which dominates when the device work is a few ms
        (measured: the tunnel round trip is ~7x the device time at batch
        64 / 1M docs). Here up to `depth` batches stay in flight: while
        batch i reads back, batches i+1..i+depth are already tokenizing /
        executing. Same programs, same results, throughput approaches the
        device+host limit instead of the round-trip limit."""
        k = top_k or self.cfg.top_k
        inflight = []

        def drain():
            out = self.collect_many(inflight)
            inflight.clear()
            return out

        for queries in query_batches:
            inflight.append(self.dispatch(list(queries), k))
            if len(inflight) >= depth:
                yield from drain()
        if inflight:
            yield from drain()
