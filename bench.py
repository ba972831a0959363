#!/usr/bin/env python
"""Benchmark: corpus-encode throughput (docs/sec) of the flagship dual
encoder (BERT-base, bf16, S=128) on one TPU chip, plus exact-MIPS QPS,
train-step, COCO-step, and end-to-end serving throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6).
Baseline proxy = 800 docs/sec/GPU — a generous public estimate for BERT-base
fp16 inference at S=128 on one V100 of the reference's 8-GPU cluster
(README.md:36 docker pins CUDA 11.3-era hardware).

Architecture (wedge-proof, round 5): the parent process never imports JAX.
Each sub-bench runs sequentially in its OWN child process
(`python bench.py --sub NAME --out FILE`); the parent enforces a wall-clock
budget per child and SIGKILLs the whole process group on timeout. SIGKILL
works even when the child is wedged inside a blocked compile RPC — unlike
the old in-process signal.alarm, whose handler only runs between Python
bytecodes and provably cannot preempt a stuck C call (this zeroed
BENCH_r04). Children write each metric to the out-file AS IT LANDS
(tmp+os.replace), and the parent merges every landed metric into
`.bench_last.json` immediately, so a later wedge can never destroy an
earlier measurement. The headline encode bench runs FIRST; serve (the most
wedge-prone compile) runs LAST. `.bench_last.json` is committed as a seed
so even a fresh checkout has a fallback for timed-out metrics (flagged
`stale` in the output).

Timing notes (see .claude/skills/verify/SKILL.md): device results are
force-read back to host — block_until_ready alone under-reports through the
axon tunnel; params are device-resident before timing.
"""
import json
import os
import subprocess
import sys
import time

GPU_BASELINE_DOCS_PER_SEC = 800.0  # single-V100 fp16 proxy, see docstring

_REPO = os.path.dirname(os.path.abspath(__file__))
LAST_RESULT_PATH = os.path.join(_REPO, ".bench_last.json")

# ---------------------------------------------------------------------------
# Child side: one sub-bench per process. JAX is imported only here.
# ---------------------------------------------------------------------------

_CHILD_OUT = [None]  # out-file path; metrics flushed here as they land
_CHILD_RESULT = {}


def _child_emit(key, value):
    """Record one landed metric and flush the out-file atomically, so the
    parent recovers everything measured so far even if this child is
    killed mid-bench."""
    _CHILD_RESULT[key] = value
    path = _CHILD_OUT[0]
    if path is None:
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(_CHILD_RESULT, f)
    os.replace(tmp, path)


def _child_setup_jax():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(_REPO, ".jax_cache"))
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def bench_encode(batch=256, seq=128, iters=15):
    import dataclasses

    import numpy as np

    jax = _child_setup_jax()
    import jax.numpy as jnp

    from cocodr_tpu.models.bert import BertConfig
    from cocodr_tpu.models.dual_encoder import build_dual_encoder

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
    docs_per_sec = batch / best
    _child_emit("metric", "corpus_encode_throughput_bert_base_bf16_s128")
    _child_emit("value", round(docs_per_sec, 1))
    _child_emit("unit", "docs/sec/chip")
    _child_emit("vs_baseline",
                round(docs_per_sec / GPU_BASELINE_DOCS_PER_SEC, 2))
    _child_emit("encode_ms_per_batch_256x128", round(best * 1e3, 2))


def bench_mips(key, n_docs=1_048_576, dim=768, n_queries=1024, k=100,
               iters=10, best_of=3, fast=False):
    """Top-k QPS: exact pallas hierarchical kernel, or the rescore-free
    block-argmax fast mode (see ops/pallas_mips). Best of `best_of` timed
    runs — the shared-tunnel chip shows ~10% run-to-run interference, and
    the minimum is the reproducible kernel latency."""
    import numpy as np

    jax = _child_setup_jax()
    import jax.numpy as jnp

    from cocodr_tpu.ops.pallas_mips import (
        mips_topk_fast,
        mips_topk_hierarchical,
    )

    search = mips_topk_fast if fast else mips_topk_hierarchical
    corpus = jax.random.normal(jax.random.PRNGKey(0), (n_docs, dim),
                               jnp.bfloat16)
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
    _child_emit(key, round(n_queries / best, 1))


def bench_train_step(key, batch=64, seq=128, q_seq=64, iters=10,
                     loss_kind="nll"):
    """ANCE-style triplet train step (3 encoder fwd + bwd + LAMB).
    remat keeps the 3-tower backward inside HBM. B=64 is the reference's
    per-GPU ANCE batch and ~24% faster per triplet than B=32 here
    (B=128/256 are slightly slower). Queries run at 64 tokens and docs at
    128 — the reference's max_query_length/max_seq_length
    (ANCE/drivers/run_ann.py:526,518). loss_kind='idro' measures the DRO
    robust step (per-sample-Gram group pass, reference n_groups=50)."""
    import dataclasses

    jax = _child_setup_jax()
    import jax.numpy as jnp

    from cocodr_tpu.models.bert import BertConfig
    from cocodr_tpu.models.dual_encoder import build_dual_encoder
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
    _child_emit(key, round(batch / best, 1))


def bench_coco(key, batch=128, seq=128, iters=8):
    """COCO pretraining step: Condenser MLM + c_head + late_mlm + global
    contrastive, B=128 spans (64 docs x 2 spans), bert-base bf16, AdamW —
    the reference stage's per-device work at its published span length, in
    the shipped configuration (no remat — activations fit at B=128; MLM
    gather budget 0.17; both measured fastest, scripts/ab_coco_step.py)."""
    import dataclasses

    import numpy as np
    import optax

    jax = _child_setup_jax()
    import jax.numpy as jnp

    from cocodr_tpu.models.bert import BertConfig
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
    # rbg dropout keys: the shipped default (cli --dropout-rng). Device
    # trace: threefry mask generation cost 42.6 ms of the 169 ms step at
    # B=128 — 24% of the whole step; the TPU hardware RNG halves that
    # (scripts/trace_coco_step.py, docs/performance.md round 5).
    rng_key = jax.random.key(0, impl="rbg")
    state, m = step(state, batch_d, rng_key)
    _ = float(m["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            state, m = step(state, batch_d, rng_key)
        _ = float(m["loss"])
        best = min(best, (time.time() - t0) / iters)
    _child_emit(key, round(batch / best, 1))


def bench_serve(n_docs=1_048_576, dim=768, batch=64, iters=5, best_of=3):
    """End-to-end serving: tokenize + encode + exact top-10 at 1M docs.
    Emits the blocking number the moment it is measured — if the pipelined
    phase wedges and the parent kills this child, blocking survives."""
    import dataclasses
    import pathlib
    import tempfile

    import numpy as np
    import transformers

    jax = _child_setup_jax()
    import jax.numpy as jnp

    from cocodr_tpu.models.bert import BertConfig
    from cocodr_tpu.models.dual_encoder import build_dual_encoder
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
    _child_emit("serve_qps_end_to_end_1M_docs", round(batch / best, 1))
    # pipelined bulk mode: up to `depth` batches in flight, grouped
    # readbacks — the per-call round trip amortizes away (serve.py
    # search_stream)
    best = float("inf")
    for _ in range(best_of):
        t0 = time.time()
        for _ in svc.search_stream([queries] * 20, depth=16):
            pass
        best = min(best, (time.time() - t0) / 20)
    _child_emit("serve_qps_pipelined_1M_docs", round(batch / best, 1))


def _selftest_wedge():
    """Test-only sub (not in SUB_ORDER): emit one metric, then wedge
    EXACTLY like a stuck compile RPC — SIGSTOP self, so no Python signal
    handler can ever run. The parent's process-group SIGKILL must still
    reap it and recover the landed metric (tests/test_bench_harness.py)."""
    import signal

    _child_emit("selftest_landed", 1)
    os.kill(os.getpid(), signal.SIGSTOP)
    time.sleep(3600)
    _child_emit("selftest_should_never_land", 1)


# (name, thunk, budget_s). Headline encode FIRST: cheapest + most-cached,
# so it always survives. Serve LAST: its tokenize+encode+search graph is
# the most wedge-prone compile, and a wedge there must not shadow anything.
SUBS = {
    "_selftest_wedge": (_selftest_wedge, 0),  # test-only, never scheduled
    "encode": (lambda: bench_encode(), 240),
    "mips_exact": (
        lambda: bench_mips("mips_exact_qps_1M_docs_k100"), 300),
    "mips_fast": (
        lambda: bench_mips("mips_fast_qps_1M_docs_k100", fast=True), 240),
    "train": (
        lambda: bench_train_step("train_triplets_per_sec_bert_base"), 300),
    "idro": (
        lambda: bench_train_step("train_idro_triplets_per_sec",
                                 loss_kind="idro"), 300),
    "coco": (lambda: bench_coco("coco_spans_per_sec_bert_base"), 300),
    "serve": (lambda: bench_serve(), 420),
}
SUB_ORDER = ["encode", "mips_exact", "mips_fast", "train", "idro", "coco",
             "serve"]

# Keys a sub must land to count as fresh (drives the parent's retry
# decision). serve's pipelined key is the completion marker; the blocking
# key landing alone still survives a later wedge.
SUB_KEYS = {
    "encode": ["value"],
    "mips_exact": ["mips_exact_qps_1M_docs_k100"],
    "mips_fast": ["mips_fast_qps_1M_docs_k100"],
    "train": ["train_triplets_per_sec_bert_base"],
    "idro": ["train_idro_triplets_per_sec"],
    "coco": ["coco_spans_per_sec_bert_base"],
    "serve": ["serve_qps_end_to_end_1M_docs", "serve_qps_pipelined_1M_docs"],
}

# Scheduling groups: one child process per GROUP, subs run sequentially
# inside it, each metric flushed to the out-file as it lands. Grouping
# amortizes the ~40-60s per-child fixed cost (JAX init + tunnel device
# discovery) that made 7 fully-isolated children overrun the 850s driver
# budget even all-warm; a wedge mid-group only loses the group's
# REMAINING subs, and the parent re-runs exactly those solo (full
# isolation on retry). Encode leads its group so the headline lands
# first; serve stays alone (most wedge-prone compile).
GROUPS = [
    (["encode", "train", "idro", "coco"], 480),
    (["mips_exact", "mips_fast"], 360),
    (["serve"], 420),
]


def _child_main(names, out_path):
    _CHILD_OUT[0] = out_path
    for name in names.split(","):
        fn, _ = SUBS[name]
        fn()


# ---------------------------------------------------------------------------
# Parent side: pure Python, no JAX. Budget enforcement via process kill.
# ---------------------------------------------------------------------------

RESULT = {}


def _load_cache():
    try:
        with open(LAST_RESULT_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _persist():
    """Merge every fresh metric into the per-metric cache (merge, never
    clobber: a partial run must not destroy the cached values it would
    fall back on). Called after EVERY sub-bench, not only at the end."""
    cache = {
        k: v for k, v in _load_cache().items()
        if not k.startswith("stale") and not k.endswith("_error")
        and not k.endswith("_group_note")
    }
    fresh = {k: v for k, v in RESULT.items()
             if not k.endswith("_error") and not k.endswith("_group_note")}
    tmp = LAST_RESULT_PATH + ".tmp"
    try:
        with open(tmp, "w") as f:
            json.dump({**cache, **fresh}, f, indent=0)
            f.write("\n")
        os.replace(tmp, LAST_RESULT_PATH)
    except OSError:
        pass


def _emit():
    result = dict(RESULT)
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


def _run_child(name, budget, first_deadline=None):
    """Run one sub-bench in a child process under a hard wall-clock budget.
    Returns (landed_metrics_dict, error_or_None). The child is its own
    session leader; on timeout the entire group gets SIGKILL — this
    preempts wedged compile RPCs and even SIGSTOPped children.

    first_deadline: seconds the child gets to land its FIRST metric. The
    compile service wedges most often on a process's first compile; with
    the committed warm cache the first metric lands in ~90-150s, so a
    child silent past this deadline is wedged and killing it early hands
    the remaining budget to a fresh process instead of burning the full
    group budget (solo retries reliably un-wedge)."""
    import signal
    import tempfile

    fd, out_path = tempfile.mkstemp(
        suffix=".json", prefix="bench_" + name.replace(",", "-") + "_")
    os.close(fd)
    os.unlink(out_path)  # child creates it on first landed metric
    err = None
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--sub", name,
         "--out", out_path],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.PIPE,
        start_new_session=True,
        cwd=_REPO,
    )
    t0 = time.time()
    timed_out = None
    while True:
        try:
            _, stderr = proc.communicate(timeout=5)
            if proc.returncode != 0:
                tail = (stderr or b"").decode("utf-8", "replace").strip()
                err = f"exit {proc.returncode}: {tail[-180:]}"
            break
        except subprocess.TimeoutExpired:
            elapsed = time.time() - t0
            if elapsed >= budget:
                timed_out = f"killed after {budget}s budget"
            elif (first_deadline is not None and elapsed >= first_deadline
                  and not os.path.exists(out_path)):
                timed_out = (
                    f"killed: no metric landed in {first_deadline}s "
                    "(wedged first compile)")
            if timed_out:
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    proc.kill()
                proc.wait()
                err = timed_out
                break
    data = {}
    try:
        with open(out_path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        pass
    try:
        os.unlink(out_path)
    except OSError:
        pass
    return data, err


def _landed(name):
    return all(k in RESULT for k in SUB_KEYS[name])


def main(total_budget=850):
    deadline = time.time() + total_budget
    early_kills = {}
    for names, budget in GROUPS:
        remaining = deadline - time.time()
        if remaining < 30:
            continue
        data, err = _run_child(
            ",".join(names), int(min(budget, remaining - 10)),
            first_deadline=210,
        )
        RESULT.update(data)
        if err is not None:
            RESULT[names[-1] + "_group_note"] = err
            if "no metric landed" in err:
                for n in names:
                    if not _landed(n):
                        early_kills[n] = 1
        _persist()  # each metric lands durably before the next group runs
    # Solo retry sweeps for whatever a group wedge swallowed: full process
    # isolation per attempt. The compile service wedges a child's first
    # RPC with high probability when degraded, and a fresh process
    # reliably un-wedges — so MANY short-deadline attempts beat one
    # long-budget attempt: keep sweeping the missing subs until the
    # deadline, killing any child silent past first_deadline.
    while True:
        missing = [n for n in SUB_ORDER if not _landed(n)]
        if not missing or deadline - time.time() < 60:
            break
        for name in missing:
            remaining = deadline - time.time()
            if remaining < 60:
                break
            _, budget = SUBS[name]
            # After two first-deadline kills, assume the service is SLOW
            # rather than wedged (observed: a degraded tunnel ran an 8x8
            # matmul in 95s — every RPC crawls but progresses) and give
            # the child its full budget uninterrupted.
            fd = 180 if early_kills.get(name, 0) < 2 else None
            data, err = _run_child(
                name, int(min(budget, remaining - 10)), first_deadline=fd)
            RESULT.update(data)
            if err is not None and "no metric landed" in err:
                early_kills[name] = early_kills.get(name, 0) + 1
            if err is not None and not _landed(name):
                RESULT[name + "_error"] = err
            else:
                RESULT.pop(name + "_error", None)
            _persist()
    for name in SUB_ORDER:
        if _landed(name):
            RESULT.pop(name + "_error", None)
        elif name + "_error" not in RESULT:
            RESULT[name + "_error"] = "skipped: global deadline reached"
    _emit()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--sub":
        _child_main(sys.argv[2], sys.argv[4])
    else:
        main()
