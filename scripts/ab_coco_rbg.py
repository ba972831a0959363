#!/usr/bin/env python
"""A/B: shipped COCO train step with threefry vs rbg dropout keys.

Follow-up to the round-5 ablation ladder (scripts/trace_coco_step.py),
which attributed 42.6 ms of the 169 ms B=128 step to threefry dropout
mask generation. This measures the END-TO-END shipped step
(build_coco_train_step: grad + clip + adamw) under both key impls with
the dispatch-free loop-delta timer, plus a loss-distribution sanity
check (same mean loss to bf16 noise — the mask DISTRIBUTION is
identical, only the bit stream differs).

Run on the TPU: python -u scripts/ab_coco_rbg.py
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.condenser import CoCondenserForPretraining
from cocodr_tpu.pipelines.coco import CocoConfig, build_coco_train_step
from cocodr_tpu.utils.train_state import TrainState

B, S = 128, 128


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = dataclasses.replace(BertConfig(), dtype=jnp.bfloat16)
    model = CoCondenserForPretraining(
        cfg, n_head_layers=2, skip_from=6, late_mlm=True,
        mlm_budget_frac=0.17,
    )
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1000, 20000, (B, S)).astype(np.int32))
    mask = jnp.ones((B, S), jnp.int32)
    labels = jnp.asarray(
        np.where(rng.rand(B, S) < 0.15,
                 rng.randint(5, 1000, size=(B, S)), -100).astype(np.int32))
    batch = jax.device_put(
        {"input_ids": ids, "attention_mask": mask, "labels": labels})
    params = model.init(jax.random.PRNGKey(0), ids[:2], mask[:2],
                        labels[:2])["params"]
    tx = optax.adamw(1e-4)
    state = jax.device_put(TrainState.create(params, tx))
    step = build_coco_train_step(model, tx, CocoConfig(max_seq_length=S))

    results = {}
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)

        @jax.jit
        def runk(s, k, key=key):
            def body(i, s):
                s2, _m = step(s, batch, jax.random.fold_in(key, i))
                return s2
            s = jax.lax.fori_loop(0, k, body, s)
            return jax.tree_util.tree_leaves(s.params)[0].sum()

        _ = float(runk(state, 1))  # compile

        def once(k, best_of=3):
            best = float("inf")
            for _ in range(best_of):
                t0 = time.time()
                _ = float(runk(state, k))
                best = min(best, time.time() - t0)
            return best

        ms = (once(18) - once(2)) / 16 * 1e3
        results[impl] = ms
        # loss sanity: mean over a few keys
        losses = []
        for i in range(4):
            _, m = step(state, batch, jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        print(f"{impl:14s} {ms:7.2f} ms/step  {B/ms*1e3:6.0f} spans/s  "
              f"mean loss {np.mean(losses):.4f}", flush=True)

    speedup = results["threefry2x32"] / results["rbg"]
    print(f"rbg speedup: {speedup:.3f}x "
          f"({results['threefry2x32']:.1f} -> {results['rbg']:.1f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
