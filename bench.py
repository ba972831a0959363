#!/usr/bin/env python
"""Benchmark: corpus-encode throughput (docs/sec) of the flagship dual
encoder (BERT-base, bf16, S=128) on one TPU chip, plus exact-MIPS QPS.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6).
Baseline proxy = 800 docs/sec/GPU — a generous public estimate for BERT-base
fp16 inference at S=128 on one V100 of the reference's 8-GPU cluster
(README.md:36 docker pins CUDA 11.3-era hardware).

Timing notes (see .claude/skills/verify/SKILL.md): device results are
force-read back to host — block_until_ready alone under-reports through the
axon tunnel; params are device-resident before timing.
"""
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ["JAX_COMPILATION_CACHE_DIR"],
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses  # noqa: E402

from cocodr_tpu.models.bert import BertConfig  # noqa: E402
from cocodr_tpu.models.dual_encoder import build_dual_encoder  # noqa: E402

GPU_BASELINE_DOCS_PER_SEC = 800.0  # single-V100 fp16 proxy, see docstring


def bench_encode(batch=256, seq=128, iters=15):
    cfg = dataclasses.replace(BertConfig(), dtype=jnp.bfloat16)
    model = build_dual_encoder("rdot_nll_condenser", cfg)
    ids = jnp.ones((batch, seq), jnp.int32)
    mask = jnp.ones((batch, seq), jnp.int32)
    params = jax.device_put(
        model.init(jax.random.PRNGKey(0), ids[:1], mask[:1])["params"]
    )
    enc = jax.jit(
        lambda p, i, m: model.apply({"params": p}, i, m, method=model.body_emb)
    )
    out = enc(params, ids, mask)
    _ = np.asarray(out)  # compile + sync
    best = float("inf")
    for _ in range(3):  # best-of: see bench_mips
        t0 = time.time()
        for _ in range(iters):
            out = enc(params, ids, mask)
        _ = np.asarray(out)
        best = min(best, (time.time() - t0) / iters)
    return batch / best, best * 1e3


def bench_mips(n_docs=1_048_576, dim=768, n_queries=1024, k=100, iters=10,
               best_of=3, fast=False):
    """Top-k QPS: exact pallas hierarchical kernel, or the rescore-free
    block-argmax fast mode (see ops/pallas_mips). Best of `best_of` timed
    runs — the shared-tunnel chip shows ~10% run-to-run interference, and
    the minimum is the reproducible kernel latency."""
    from cocodr_tpu.ops.pallas_mips import (
        mips_topk_fast,
        mips_topk_hierarchical,
    )

    search = mips_topk_fast if fast else mips_topk_hierarchical
    corpus = jax.random.normal(jax.random.PRNGKey(0), (n_docs, dim), jnp.bfloat16)
    queries = jax.random.normal(
        jax.random.PRNGKey(1), (n_queries, dim), jnp.bfloat16
    )
    jax.block_until_ready((corpus, queries))
    v, _ = search(queries, corpus, k)
    _ = np.asarray(v)
    best = float("inf")
    for _ in range(best_of):
        t0 = time.time()
        for _ in range(iters):
            v, _ = search(queries, corpus, k)
        _ = np.asarray(v)
        best = min(best, (time.time() - t0) / iters)
    return n_queries / best


def bench_train_step(batch=64, seq=128, q_seq=64, iters=10,
                     loss_kind="nll"):
    """ANCE-style triplet train step (3 encoder fwd + bwd + LAMB).
    remat keeps the 3-tower backward inside HBM. B=64 is the reference's
    per-GPU ANCE batch and ~24% faster per triplet than B=32 here
    (B=128/256 are slightly slower). Queries run at 64 tokens and docs at
    128 — the reference's max_query_length/max_seq_length
    (ANCE/drivers/run_ann.py:526,518). loss_kind='idro' measures the DRO
    robust step (per-sample-Gram group pass, reference n_groups=50)."""
    import optax

    from cocodr_tpu.optim import lamb, warmup_linear
    from cocodr_tpu.pipelines.train_step import (
        TrainStepConfig,
        build_train_step,
    )
    from cocodr_tpu.utils.train_state import TrainState

    cfg = dataclasses.replace(BertConfig(), dtype=jnp.bfloat16, remat=True)
    model = build_dual_encoder("rdot_nll_condenser", cfg)
    ids = jnp.ones((batch, seq), jnp.int32)
    mask = jnp.ones((batch, seq), jnp.int32)
    q_ids = jnp.ones((batch, q_seq), jnp.int32)
    q_mask = jnp.ones((batch, q_seq), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids[:1], mask[:1])["params"]
    tx = lamb(warmup_linear(2e-4, 1000, 100000))
    extra = None
    scfg = TrainStepConfig(loss_kind=loss_kind)
    if loss_kind == "idro":
        from cocodr_tpu.losses import DroConfig, idro_init

        # n_groups=50 is the reference's published hyperparameter
        # (ANCE/README.md); the Gram-based group pass makes step cost
        # independent of G, so benching the real config costs nothing
        dro = DroConfig(n_groups=50)
        scfg = TrainStepConfig(loss_kind="idro", dro=dro)
        extra = idro_init(dro)
    state = jax.device_put(TrainState.create(params, tx, extra=extra))
    step = build_train_step(model, tx, scfg)
    b = {
        "q_ids": q_ids, "q_mask": q_mask, "pos_ids": ids, "pos_mask": mask,
        "neg_ids": ids, "neg_mask": mask,
    }
    if loss_kind == "idro":
        b["groups"] = jnp.arange(batch, dtype=jnp.int32) % 50
    b = jax.device_put(b)
    state, m = step(state, b)
    _ = float(m["loss"])
    best = float("inf")
    for _ in range(3):  # best-of: see bench_mips
        t0 = time.time()
        for _ in range(iters):
            state, m = step(state, b)
        _ = float(m["loss"])
        best = min(best, (time.time() - t0) / iters)
    return batch / best


def bench_coco(batch=128, seq=128, iters=8):
    """COCO pretraining step: Condenser MLM + c_head + late_mlm + global
    contrastive, B=128 spans (64 docs x 2 spans), bert-base bf16, AdamW —
    the reference stage's per-device work at its published span length, in
    the shipped configuration (no remat — activations fit at B=128; MLM
    gather budget 0.17; both measured fastest, scripts/ab_coco_step.py)."""
    import optax

    from cocodr_tpu.models.condenser import CoCondenserForPretraining
    from cocodr_tpu.pipelines.coco import CocoConfig, build_coco_train_step
    from cocodr_tpu.utils.train_state import TrainState

    cfg = dataclasses.replace(BertConfig(), dtype=jnp.bfloat16)
    model = CoCondenserForPretraining(
        cfg, n_head_layers=2, skip_from=6, late_mlm=True,
        mlm_budget_frac=0.17,
    )
    ids = jnp.ones((batch, seq), jnp.int32)
    mask = jnp.ones((batch, seq), jnp.int32)
    rng = np.random.RandomState(0)
    labels = jnp.asarray(
        np.where(rng.rand(batch, seq) < 0.15,
                 rng.randint(5, 1000, size=(batch, seq)), -100)
        .astype(np.int32)
    )
    params = model.init(
        jax.random.PRNGKey(0), ids[:2], mask[:2], labels[:2]
    )["params"]
    tx = optax.adamw(1e-4)
    state = jax.device_put(TrainState.create(params, tx))
    step = build_coco_train_step(model, tx, CocoConfig(max_seq_length=seq))
    batch_d = jax.device_put(
        {"input_ids": ids, "attention_mask": mask, "labels": labels}
    )
    key = jax.random.PRNGKey(0)
    state, m = step(state, batch_d, key)
    _ = float(m["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            state, m = step(state, batch_d, key)
        _ = float(m["loss"])
        best = min(best, (time.time() - t0) / iters)
    return batch / best


def bench_serve(n_docs=1_048_576, dim=768, batch=64, iters=5, best_of=3):
    """End-to-end serving: tokenize + encode + exact top-10 at 1M docs."""
    import pathlib
    import tempfile

    import transformers

    from cocodr_tpu.pipelines.serve import RetrievalService, ServeConfig

    d = pathlib.Path(tempfile.mkdtemp())
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(100)
    ]
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(vocab_file=str(d / "vocab.txt"))
    cfg = dataclasses.replace(BertConfig(), dtype=jnp.bfloat16)
    model = build_dual_encoder("rdot_nll_condenser", cfg)
    ids = jnp.ones((1, 64), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, ids)["params"]
    corpus = np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (n_docs, dim), jnp.bfloat16),
        np.float32,
    )
    svc = RetrievalService(
        model, params, tok, corpus,
        cfg=ServeConfig(top_k=10, max_batch=batch),
    )
    queries = [f"w{i % 90} w{(i * 7) % 90} w{(i * 13) % 90}"
               for i in range(batch)]
    svc.search(queries)  # compile
    best = float("inf")
    for _ in range(best_of):
        t0 = time.time()
        for _ in range(iters):
            svc.search(queries)
        best = min(best, (time.time() - t0) / iters)
    qps_blocking = batch / best
    # record immediately: if the pipelined phase below wedges and the
    # alarm fires, the already-measured blocking number must survive
    RESULT["serve_qps_end_to_end_1M_docs"] = round(qps_blocking, 1)
    # pipelined bulk mode: up to `depth` batches in flight, grouped
    # readbacks — the per-call round trip amortizes away (serve.py
    # search_stream)
    best = float("inf")
    for _ in range(best_of):
        t0 = time.time()
        for _ in svc.search_stream([queries] * 20, depth=16):
            pass
        best = min(best, (time.time() - t0) / 20)
    return qps_blocking, batch / best


LAST_RESULT_PATH = os.path.join(os.path.dirname(__file__), ".bench_last.json")

# Mutated in place as each sub-bench lands, so the global watchdog can emit
# every fresh number collected so far instead of replaying the whole cache.
RESULT = {}


def _load_cache():
    try:
        with open(LAST_RESULT_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _emit(result):
    cache = _load_cache()
    stale_keys = [
        k for k in cache
        if k not in result and not k.startswith("stale")
        and not k.endswith("_error")
    ]
    if stale_keys:
        for k in stale_keys:
            result[k] = cache[k]
        result["stale"] = True
        result["stale_reason"] = (
            "timed-out metrics replayed from cache: " + ",".join(stale_keys)
        )
    if "metric" not in result:  # encode failed AND no cache to fall back on
        result.update({
            "metric": "corpus_encode_throughput_bert_base_bf16_s128",
            "value": 0, "unit": "docs/sec/chip", "vs_baseline": 0,
        })
    # Re-order: headline keys first for readability.
    ordered = {k: result[k] for k in ("metric", "value", "unit", "vs_baseline")
               if k in result}
    ordered.update({k: v for k, v in result.items() if k not in ordered})
    print(json.dumps(ordered))


class _BenchTimeout(Exception):
    pass


def _run(fn, budget, retries=1):
    """Run fn under a SIGALRM budget; retry once with a fresh alarm before
    giving up (the remote compile service wedges transiently — a retry
    usually lands because the persistent cache has the partial compiles).

    Budgets are clamped to the global deadline so the sum of sub-bench
    retries can never push the final emit past the driver's outer budget;
    with <45s left, sub-benches fail fast and fall back to the cache."""
    import signal

    if _DEADLINE[0] is not None:
        remaining = int(_DEADLINE[0] - time.time())
        if remaining < 45:
            raise _BenchTimeout("global deadline reached")
        budget = min(budget, remaining - 15)

    def on_alarm(signum, frame):
        raise _BenchTimeout()

    for _ in range(retries + 1):
        old = signal.signal(signal.SIGALRM, on_alarm)
        signal.alarm(budget)
        try:
            return fn()
        except _BenchTimeout:
            continue
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
    raise _BenchTimeout(f"timed out twice ({budget}s budget)")


def _finalize():
    """Persist fresh metrics into the per-metric cache (merge, never
    clobber: a partial run must not destroy the cached values it would
    fall back on), then emit."""
    cache = {
        k: v for k, v in _load_cache().items()
        if not k.startswith("stale") and not k.endswith("_error")
    }
    fresh = {k: v for k, v in RESULT.items() if not k.endswith("_error")}
    try:
        with open(LAST_RESULT_PATH, "w") as f:
            json.dump({**cache, **fresh}, f)
    except OSError:
        pass
    _emit(RESULT)


_DEADLINE = [None]  # wall-clock time.time() the whole bench must emit by


def _watchdog(seconds=850):
    """Last-resort guard: if the whole bench wedges, emit what was measured
    so far (plus cached values for the rest) instead of hanging the driver.

    Uses a daemon thread timer, NOT signal.alarm: each `_run` sub-budget
    already owns the process's single SIGALRM timer, and its
    `signal.alarm(0)` cleanup would silently cancel a watchdog alarm
    (observed: the bench ran past the driver's outer budget with zero
    output). 850s keeps the emit inside a ~900s driver budget."""
    import threading

    _DEADLINE[0] = time.time() + seconds

    def on_timeout():
        _finalize()
        os._exit(0)

    t = threading.Timer(seconds, on_timeout)
    t.daemon = True
    t.start()


def _preimport():
    """Import every heavy module BEFORE any alarm can fire: a _BenchTimeout
    raised mid-import leaves a half-initialized module that poisons the
    in-process retry (observed: pallas config double-registration)."""
    import transformers  # noqa: F401

    import cocodr_tpu.ops.pallas_mips  # noqa: F401
    import cocodr_tpu.optim  # noqa: F401
    import cocodr_tpu.pipelines.serve  # noqa: F401
    import cocodr_tpu.pipelines.train_step  # noqa: F401
    import cocodr_tpu.utils.train_state  # noqa: F401


def main():
    _preimport()
    _watchdog()
    # Serve first: it compiles the most wedge-prone shapes (tokenize +
    # encode + search in one graph) — run them while the compile service
    # is fresh rather than last.
    try:
        blocking, piped = _run(bench_serve, budget=420)
        RESULT["serve_qps_end_to_end_1M_docs"] = round(blocking, 1)
        RESULT["serve_qps_pipelined_1M_docs"] = round(piped, 1)
    except Exception as e:
        RESULT["serve_error"] = str(e)[:200]
    try:
        docs_per_sec, ms_per_batch = _run(bench_encode, budget=240)
        RESULT.update({
            "metric": "corpus_encode_throughput_bert_base_bf16_s128",
            "value": round(docs_per_sec, 1),
            "unit": "docs/sec/chip",
            "vs_baseline": round(docs_per_sec / GPU_BASELINE_DOCS_PER_SEC, 2),
            "encode_ms_per_batch_256x128": round(ms_per_batch, 2),
        })
    except Exception as e:
        RESULT["encode_error"] = str(e)[:200]  # headline filled by _emit
    for key, fn, budget in (
        ("mips_exact_qps_1M_docs_k100", bench_mips, 300),
        ("mips_fast_qps_1M_docs_k100", lambda: bench_mips(fast=True), 240),
        ("train_triplets_per_sec_bert_base", bench_train_step, 240),
        ("train_idro_triplets_per_sec",
         lambda: bench_train_step(loss_kind="idro"), 240),
        ("coco_spans_per_sec_bert_base", bench_coco, 240),
    ):
        try:
            RESULT[key] = round(_run(fn, budget=budget), 1)
        except Exception as e:
            RESULT[key + "_error"] = str(e)[:200]
    _finalize()


if __name__ == "__main__":
    main()
