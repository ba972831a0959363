#!/usr/bin/env python
"""COCO-step cost accounting (VERDICT r4 ask #5): where do the ms/step go?

Two instruments, same shapes as the shipped bench (B=128 spans, S=128,
bert-base bf16, AdamW, mlm_budget 0.17, no remat — bench.py bench_coco):

1. Ablation ladder: jit a sequence of partial steps and report MARGINAL
   costs — backbone fwd, +c_head, +MLM pair, +contrastive, bwd, optimizer.
   Each is the full shipped computation minus one term, so differences
   attribute wall time to components without trusting fusion names.
2. Device trace of the full step (jax.profiler) -> parse with
   scripts/parse_trace.py for the per-fusion view.

Run on the TPU: python -u scripts/trace_coco_step.py [--trace]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, ".")

import jax

TINY = bool(os.environ.get("TRACE_TINY"))  # CPU smoke: tiny config
if TINY:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.condenser import CoCondenserForPretraining
from cocodr_tpu.pipelines.coco import CocoConfig, build_coco_train_step
from cocodr_tpu.utils.train_state import TrainState

B, S = (8, 32) if TINY else (128, 128)
TRACE_OUT = "/tmp/coco_step_trace"


def make_model(**kw):
    base = BertConfig.tiny() if TINY else BertConfig()
    cfg = dataclasses.replace(base, dtype=jnp.bfloat16)
    kw.setdefault("n_head_layers", 2)
    kw.setdefault("skip_from", 1 if TINY else 6)
    kw.setdefault("late_mlm", True)
    kw.setdefault("mlm_budget_frac", 0.17)
    return CoCondenserForPretraining(cfg, **kw)


def make_batch():
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(5, (100 if TINY else 20000), (B, S)).astype(np.int32))
    mask = jnp.ones((B, S), jnp.int32)
    labels = jnp.asarray(
        np.where(rng.rand(B, S) < 0.15,
                 rng.randint(5, (100 if TINY else 1000), size=(B, S)), -100).astype(np.int32)
    )
    return {"input_ids": ids, "attention_mask": mask, "labels": labels}


def timeit(fn, *args, iters=8, best_of=3):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])  # tunnel readback
    best = float("inf")
    for _ in range(best_of):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3  # ms


def timeit_loop(grad_fn, params, k_small=2, k_big=18, best_of=3):
    """Dispatch-overhead-free per-call time: run K calls inside ONE
    jitted lax.fori_loop (dynamic trip count — one compile) and report
    (t(k_big) - t(k_small)) / (k_big - k_small). Each iteration chains
    params through a numerically-inert 1e-30 * grad add so the compiler
    can neither DCE nor overlap iterations. Robust against degraded
    tunnel RPC latency (a constant per-dispatch cost cancels in the
    delta); under a healthy tunnel it agrees with `timeit` minus the
    ~ms dispatch cost."""

    @jax.jit
    def runk(p, k):
        def body(_, p):
            g = grad_fn(p)
            return jax.tree_util.tree_map(
                lambda a, b: a + jnp.asarray(1e-30, a.dtype) * b, p, g)

        p = jax.lax.fori_loop(0, k, body, p)
        return jax.tree_util.tree_leaves(p)[0].sum()

    def once(k):
        best = float("inf")
        for _ in range(best_of):
            t0 = time.time()
            _ = float(runk(params, k))
            best = min(best, time.time() - t0)
        return best

    _ = float(runk(params, 1))  # compile
    return (once(k_big) - once(k_small)) / (k_big - k_small) * 1e3


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    batch = make_batch()
    key = jax.random.PRNGKey(0)

    model = make_model()
    params = model.init(
        jax.random.PRNGKey(0), batch["input_ids"][:2],
        batch["attention_mask"][:2], batch["labels"][:2]
    )["params"]
    tx = optax.adamw(1e-4)
    state = jax.device_put(TrainState.create(params, tx))

    rows = []

    def row(name, ms):
        rows.append((name, ms))
        print(f"{name:44s} {ms:8.2f} ms  ({B/ms*1e3:6.0f} spans/s)",
              flush=True)

    # --- forward-only ladder -------------------------------------------
    p = state.params

    @jax.jit
    def f_backbone(p):
        return model.apply({"params": p}, batch["input_ids"],
                           batch["attention_mask"], method=model.cls_emb)

    row("fwd: backbone only (cls_emb)", timeit(f_backbone, p))

    @jax.jit
    def f_full(p):
        loss, aux = model.apply(
            {"params": p}, batch["input_ids"], batch["attention_mask"],
            batch["labels"], method=model.loss_with_contrastive)
        return loss

    row("fwd: full loss (+c_head+MLM pair+contr)", timeit(f_full, p))

    # --- grad ladder: full grad minus one term each --------------------
    # NOTE deterministic=True here (no dropout): the shipped step runs
    # WITH dropout, so "grad: full loss +dropout" below isolates the
    # threefry mask-generation marginal — a prime non-matmul suspect
    # (~600M random bits/step across 12 layers x 3 dropout sites).
    def grad_row(name, m, method_name="loss_with_contrastive",
                 dropout=False, params=None):
        def lf(p):
            out = m.apply({"params": p}, batch["input_ids"],
                          batch["attention_mask"], batch["labels"],
                          method=getattr(m, method_name),
                          deterministic=not dropout,
                          rngs={"dropout": key} if dropout else None)
            return out[0] if isinstance(out, tuple) else out

        row(name, timeit_loop(jax.grad(lf),
                              full_params if params is None else params))

    full_params = state.params
    grad_row("grad: full loss", model)
    grad_row("grad: full loss +dropout", model, dropout=True)
    # candidate fix: key the dropout stream with the TPU hardware RNG
    # (rbg) instead of threefry — same distribution, no crypto-grade
    # mask-bit cost; the reference's masks are torch RNG anyway, so no
    # parity constraint on the bits themselves
    rbg_key = jax.random.key(0, impl="rbg")

    def g_rbg(p):
        loss, aux = model.apply(
            {"params": p}, batch["input_ids"], batch["attention_mask"],
            batch["labels"], method=model.loss_with_contrastive,
            deterministic=False, rngs={"dropout": rbg_key})
        return loss

    row("grad: full loss +dropout(rbg)",
        timeit_loop(jax.grad(g_rbg), full_params))

    # no contrastive (plain Condenser __call__ loss)
    grad_row("grad: -contrastive (MLM pair only)", model, "__call__")

    # no late_mlm (single MLM loss on c_head)
    grad_row("grad: -late_mlm (head MLM only)", make_model(late_mlm=False))

    # no c_head (0 head layers; MLM pair on [CLS,skip] concat directly)
    p3 = {k: v for k, v in full_params.items()
          if not k.startswith("c_head")}
    grad_row("grad: -c_head (0 head layers)", make_model(n_head_layers=0),
             params=p3)

    # dense MLM decoder (budget off) — is the 0.17 gather still paying?
    grad_row("grad: dense MLM decoder (budget off)",
             make_model(mlm_budget_frac=1.0))

    # --- full shipped step (grad + clip + adamw) -----------------------
    step = build_coco_train_step(model, tx, CocoConfig(max_seq_length=S))

    @jax.jit
    def run_steps(state, k):
        def body(_, s):
            s2, _m = step(s, batch, key)
            return s2
        s = jax.lax.fori_loop(0, k, body, state)
        # consume a PARAM leaf, not s.step: the step counter is computable
        # as state.step + k, so returning it lets XLA DCE the entire body
        return jax.tree_util.tree_leaves(s.params)[0].sum()

    _ = float(run_steps(state, 1))  # compile

    def steps_t(k, best_of=3):
        best = float("inf")
        for _ in range(best_of):
            t0 = time.time()
            _ = float(run_steps(state, k))
            best = min(best, time.time() - t0)
        return best

    row("FULL STEP (shipped: grad+clip+adamw)",
        (steps_t(18) - steps_t(2)) / 16 * 1e3)

    print("\nmarginals (ms):", flush=True)
    d = dict(rows)
    fwd = d["fwd: full loss (+c_head+MLM pair+contr)"]
    grad = d["grad: full loss"]
    print(f"  backbone fwd                 {d['fwd: backbone only (cls_emb)']:8.2f}")
    print(f"  heads+losses fwd             {fwd - d['fwd: backbone only (cls_emb)']:8.2f}")
    print(f"  backward (grad - fwd)        {grad - fwd:8.2f}")
    print(f"  dropout (threefry) marginal  {d['grad: full loss +dropout'] - grad:8.2f}")
    print(f"  contrastive marginal         {grad - d['grad: -contrastive (MLM pair only)']:8.2f}")
    print(f"  late_mlm marginal            {grad - d['grad: -late_mlm (head MLM only)']:8.2f}")
    print(f"  c_head marginal              {grad - d['grad: -c_head (0 head layers)']:8.2f}")
    print(f"  dense-MLM penalty            {d['grad: dense MLM decoder (budget off)'] - grad:8.2f}")
    print(f"  optimizer+clip marginal      {d['FULL STEP (shipped: grad+clip+adamw)'] - grad:8.2f}")

    if "--trace" in sys.argv:
        print("\ntracing full step ...", flush=True)
        jax.profiler.start_trace(TRACE_OUT)
        s = state
        for _ in range(4):
            s, m = step(s, batch, key)
        _ = float(m["loss"])
        jax.profiler.stop_trace()
        print("trace ->", TRACE_OUT,
              "(parse: python scripts/parse_trace.py", TRACE_OUT + ")",
              flush=True)


if __name__ == "__main__":
    main()
