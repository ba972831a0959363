"""BEIR evaluation pipeline: tokenize -> encode -> exact MIPS -> score.

Rebuild of the reference's 3-stage harness (reference
evaluate/commands/run_evaluate.sh:12-41 — beir_data.py tokenization,
run_ann_data_gen.py --inference encode, evaluate_beir.py scoring) as one
driver with on-device search instead of per-rank pickles + FAISS.

Per-task sequence lengths follow the reference (evaluate/README.md):
query 64 (128 for ArguAna), doc 128 (256 for TREC-NEWS / Robust04 / SciFact).
ArguAna skips self-matches (evaluate_beir.py:143-145).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import numpy as np

from cocodr_tpu.data.native import open_token_cache
from cocodr_tpu.data.preprocess import (
    load_beir_qrels,
    tokenize_beir_corpus,
    tokenize_beir_queries,
)
from cocodr_tpu.evals.metrics import evaluate_run, run_from_topk
from cocodr_tpu.parallel.topk import search_topk
from cocodr_tpu.pipelines.encode import EncodeConfig, Encoder, encode_cache

# Reference lengths: evaluate/README.md + evaluate_beir.py:62
LONG_DOC_TASKS = {"trec-news", "robust04", "scifact"}
LONG_QUERY_TASKS = {"arguana"}
SELF_SKIP_TASKS = {"arguana"}


@dataclasses.dataclass
class BeirEvalConfig:
    task: str = "scifact"
    query_len: int = 64
    doc_len: int = 128
    top_k: int = 1000
    batch_size: int = 512
    q_chunk: int = 4096
    mips_tile: int = 32768
    ndcg_k: int = 10
    recall_ks: tuple = (10, 100, 1000)
    exact_fp32: bool = False
    length_buckets: tuple = ()  # bucketed corpus encode (see MineConfig)
    # 'auto' (exact pallas on TPU) | 'fast' (block-argmax, ~99.98%
    # recall@100) | 'ivf' (clustered approximate, ops/ivf.py; recall set
    # by ivf_nprobe) | 'pallas' | 'blockmax' | 'refined' | 'naive'
    search_method: str = "auto"
    ivf_nprobe: int = 32

    @classmethod
    def for_task(cls, task: str, **kw) -> "BeirEvalConfig":
        t = task.lower()
        kw.setdefault("query_len", 128 if t in LONG_QUERY_TASKS else 64)
        kw.setdefault("doc_len", 256 if t in LONG_DOC_TASKS else 128)
        return cls(task=t, **kw)


def prepare_beir_task(
    data_dir: str,
    out_dir: str,
    tokenizer,
    cfg: BeirEvalConfig,
    split: str = "test",
    n_workers: int = 1,
):
    """Tokenize corpus/queries/qrels into record files (idempotent)."""
    os.makedirs(out_dir, exist_ok=True)
    corpus_path = os.path.join(out_dir, "passages")
    query_path = os.path.join(out_dir, "queries")
    qrels = load_beir_qrels(os.path.join(data_dir, "qrels", f"{split}.tsv"))
    if not os.path.exists(corpus_path + "_meta"):
        docid2off = tokenize_beir_corpus(
            os.path.join(data_dir, "corpus.jsonl"),
            corpus_path,
            tokenizer,
            cfg.doc_len,
            clean=cfg.task == "robust04",
            n_workers=n_workers,
        )
    else:
        from cocodr_tpu.data.records import load_id_map

        docid2off = load_id_map(corpus_path + ".docid2offset.pickle")
    if not os.path.exists(query_path + "_meta"):
        qid2off = tokenize_beir_queries(
            os.path.join(data_dir, "queries.jsonl"),
            query_path,
            tokenizer,
            cfg.query_len,
            keep=set(qrels),
            clean=cfg.task == "robust04",
        )
    else:
        from cocodr_tpu.data.records import load_id_map

        qid2off = load_id_map(query_path + ".qid2offset.pickle")
    return corpus_path, query_path, docid2off, qid2off, qrels


def evaluate_beir_task(
    model,
    params,
    corpus_path: str,
    query_path: str,
    docid2off: Dict[str, int],
    qid2off: Dict[str, int],
    qrels: Dict[str, Dict[str, int]],
    cfg: BeirEvalConfig,
    mesh=None,
) -> Dict[str, float]:
    corpus_cache = open_token_cache(corpus_path)
    query_cache = open_token_cache(query_path)

    doc_encoder = Encoder(model, params, mesh=mesh, is_query=False)
    query_encoder = Encoder(model, params, mesh=mesh, is_query=True)
    ecfg = EncodeConfig(batch_size=cfg.batch_size,
                        length_buckets=cfg.length_buckets)

    # multi-chunk long-doc models index one vector per chunk; retrieval
    # dedupes to the best-scoring chunk per document (the reference's
    # seen_pid handling, evaluate_beir.py:132-134)
    chunk_len = getattr(model.cfg, "chunk_len", 0)
    multivector = bool(chunk_len) and corpus_cache.max_len > chunk_len
    if multivector:
        from cocodr_tpu.pipelines.encode import encode_cache_multivector

        if cfg.length_buckets:
            import warnings

            warnings.warn(
                "length_buckets is ignored for multi-chunk models: chunked "
                "records are fixed-width (C*chunk_len)", stacklevel=2,
            )

        corpus_emb, row2doc = encode_cache_multivector(
            doc_encoder, corpus_cache, ecfg, chunk_len=chunk_len
        )
    else:
        corpus_emb = encode_cache(doc_encoder, corpus_cache, ecfg)
        row2doc = None
    query_emb = encode_cache(query_encoder, query_cache, ecfg)

    k = min(cfg.top_k, corpus_emb.shape[0])
    _, top_ids = search_topk(
        query_emb, corpus_emb, k, mesh=mesh, q_chunk=cfg.q_chunk,
        tile=cfg.mips_tile, exact_fp32=cfg.exact_fp32,
        method=cfg.search_method, ivf_nprobe=cfg.ivf_nprobe,
    )
    if row2doc is not None:
        top_ids = np.where(top_ids >= 0, row2doc[top_ids], -1)

    off2docid = {v: k_ for k_, v in docid2off.items()}
    off2qid = {v: k_ for k_, v in qid2off.items()}
    query_ids = [off2qid[i] for i in range(len(query_cache))]
    run = run_from_topk(
        query_ids,
        top_ids,
        id_map=off2docid,
        skip_self=cfg.task in SELF_SKIP_TASKS,
        dedupe=multivector,
    )
    return evaluate_run(
        run,
        qrels,
        ndcg_k=cfg.ndcg_k,
        recall_ks=cfg.recall_ks,
    )


def eval_beir(
    model,
    params,
    data_dir: str,
    work_dir: str,
    tokenizer,
    task: Optional[str] = None,
    mesh=None,
    **cfg_kw,
) -> Dict[str, float]:
    """One-call BEIR evaluation for a task directory."""
    task = task or os.path.basename(os.path.normpath(data_dir))
    cfg = BeirEvalConfig.for_task(task, **cfg_kw)
    corpus_path, query_path, d2o, q2o, qrels = prepare_beir_task(
        data_dir, work_dir, tokenizer, cfg
    )
    return evaluate_beir_task(
        model, params, corpus_path, query_path, d2o, q2o, qrels, cfg, mesh=mesh
    )
