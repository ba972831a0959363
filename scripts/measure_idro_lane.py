#!/usr/bin/env python
"""iDRO lane-fallback cost at its REAL config (VERDICT r4 ask #4).

The lane group pass (G vmapped top-K backward lanes,
pipelines/train_step.py _build_idro_lane_step) is the compilable fallback
for models the Gram fast path can't serve (two-tower DPR, multi-chunk
long-doc, forced via idro_lane_group_pass). Round 4 only measured it on a
tiny two-tower config; this measures bert-base at the reference's
published hyperparameters — B=64, G=50, K=3
(reference ANCE/README.md Key Hyperparameters) — and reports compile time
and ms/step next to the Gram numbers (bench.py: idro ~330 tri/s).

Two variants:
  lane-forced: single-tower rdot_nll_condenser with idro_lane_group_pass
     (isolates lane-vs-Gram on the identical model);
  two-tower: the dpr config that actually NEEDS the fallback.

Run on the TPU: python -u scripts/measure_idro_lane.py [--two-tower-only]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, ".")

import jax

TINY = bool(os.environ.get("LANE_TINY"))  # CPU smoke: tiny config
if TINY:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cocodr_tpu.losses import DroConfig, idro_init
from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder
from cocodr_tpu.optim import lamb, warmup_linear
from cocodr_tpu.pipelines.train_step import TrainStepConfig, build_train_step
from cocodr_tpu.utils.train_state import TrainState

B, SEQ, QSEQ, G, K = (8, 16, 16, 4, 1) if TINY else (64, 128, 64, 50, 3)


def measure(model_type, lane_forced, label):
    base = BertConfig.tiny() if TINY else BertConfig()
    cfg = dataclasses.replace(base, dtype=jnp.bfloat16, remat=True)
    model = build_dual_encoder(model_type, cfg)
    ids = jnp.ones((B, SEQ), jnp.int32)
    mask = jnp.ones((B, SEQ), jnp.int32)
    q_ids = jnp.ones((B, QSEQ), jnp.int32)
    q_mask = jnp.ones((B, QSEQ), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids[:1], mask[:1])["params"]
    if model.cfg.two_tower:
        params = dict(params)
        init2 = model.init(
            jax.random.PRNGKey(1), ids[:1], mask[:1], method=model.body_emb
        )["params"]
        for k in init2:
            params.setdefault(k, init2[k])
    tx = lamb(warmup_linear(5e-6, 3000, 45000))
    dro = DroConfig(n_groups=G)
    scfg = TrainStepConfig(
        loss_kind="idro", dro=dro, idro_last_k_layers=K,
        idro_lane_group_pass=lane_forced,
    )
    state = jax.device_put(
        TrainState.create(params, tx, extra=idro_init(dro)))
    step = build_train_step(model, tx, scfg)
    batch = jax.device_put({
        "q_ids": q_ids, "q_mask": q_mask, "pos_ids": ids, "pos_mask": mask,
        "neg_ids": ids, "neg_mask": mask,
        "groups": jnp.arange(B, dtype=jnp.int32) % G,
    })
    t0 = time.time()
    state, m = step(state, batch)
    _ = float(m["loss"])
    compile_s = time.time() - t0

    # dispatch-free loop-delta timing (see trace_coco_step.timeit_loop):
    # K steps inside one jitted fori_loop; constant tunnel-RPC overhead
    # cancels in (t(K2)-t(K1))/(K2-K1)
    @jax.jit
    def runk(s, k):
        def body(_, s):
            s2, _m = step(s, batch)
            return s2
        s = jax.lax.fori_loop(0, k, body, s)
        # consume a PARAM leaf, not s.step: the counter is state.step + k,
        # so returning it lets XLA DCE the entire loop body
        return jax.tree_util.tree_leaves(s.params)[0].sum()

    _ = float(runk(state, 1))  # compile the loop wrapper

    def once(k, best_of=3):
        best = float("inf")
        for _ in range(best_of):
            t0 = time.time()
            _ = float(runk(state, k))
            best = min(best, time.time() - t0)
        return best

    best = (once(10) - once(2)) / 8
    print(f"{label:42s} compile {compile_s:6.1f}s   step "
          f"{best*1e3:8.1f} ms   {B/best:7.1f} tri/s", flush=True)
    return compile_s, best


def main():
    print("platform:", jax.devices()[0].platform,
          f"(B={B} G={G} K={K}, bert-base bf16 remat)", flush=True)
    if "--two-tower-only" not in sys.argv:
        measure("rdot_nll_condenser", False, "Gram fast path (reference)")
        measure("rdot_nll_condenser", True, "lane pass, forced (same model)")
    measure("dpr", True, "lane pass, two-tower dpr (needs it)")


if __name__ == "__main__":
    main()
