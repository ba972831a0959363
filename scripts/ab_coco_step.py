"""A/B the COCO pretrain step (VERDICT r03 item 7: target >= 800 spans/s
at B=128 S=128 bert-base on one v5e; round-3 number was ~670).

Variants: fused head+late MLM decoder pair (shipped), remat policy
(full recompute vs dots_saveable vs none), and the MLM gather budget
(0.25 vs 0.17 — the WWM collator caps masking at round(0.15*len)/seq).

Run: python -u scripts/ab_coco_step.py
Numbers recorded in docs/performance.md.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
import optax

from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.condenser import CoCondenserForPretraining
from cocodr_tpu.pipelines.coco import CocoConfig, build_coco_train_step
from cocodr_tpu.utils.train_state import TrainState

B, S, ITERS = 128, 128, 8


def run(name, remat=True, remat_policy="", budget=0.25, B=B):
    cfg = dataclasses.replace(
        BertConfig(), dtype=jnp.bfloat16, remat=remat,
        remat_policy=remat_policy,
    )
    model = CoCondenserForPretraining(
        cfg, n_head_layers=2, skip_from=6, late_mlm=True,
        mlm_budget_frac=budget,
    )
    ids = jnp.ones((B, S), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    rng = np.random.RandomState(0)
    labels = jnp.asarray(
        np.where(rng.rand(B, S) < 0.15,
                 rng.randint(5, 1000, size=(B, S)), -100).astype(np.int32)
    )
    params = model.init(
        jax.random.PRNGKey(0), ids[:2], mask[:2], labels[:2]
    )["params"]
    tx = optax.adamw(1e-4)
    state = jax.device_put(TrainState.create(params, tx))
    step = build_coco_train_step(model, tx, CocoConfig(max_seq_length=S))
    batch = jax.device_put(
        {"input_ids": ids, "attention_mask": mask, "labels": labels}
    )
    key = jax.random.PRNGKey(0)
    try:
        state, m = step(state, batch, key)
        _ = float(m["loss"])
    except Exception as e:
        print(f"{name:42s} FAILED: {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        return
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(ITERS):
            state, m = step(state, batch, key)
        _ = float(m["loss"])
        best = min(best, (time.time() - t0) / ITERS)
    print(f"{name:42s} {B/best:7.0f} spans/s  ({best*1e3:6.1f} ms/step)",
          flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    which = os.environ.get("VARIANTS", "policy")
    if which == "policy":
        run("base (remat full, budget 0.25)")
        run("remat dots_saveable", remat_policy="dots_saveable")
        run("no remat", remat=False)
        run("budget 0.17", budget=0.17)
        run("dots_saveable + budget 0.17",
            remat_policy="dots_saveable", budget=0.17)
        run("no remat + budget 0.17", remat=False, budget=0.17)
    elif which == "batch":
        # fixed per-step costs (MLM head, c_head, optimizer, embed/pool)
        # amortize with B; the reference per-GPU batch at base is 200 docs
        # (COCO/README.md), so large per-chip B is the production regime
        run("no remat + budget 0.17, B=128", remat=False, budget=0.17)
        run("no remat + budget 0.17, B=192", remat=False, budget=0.17,
            B=192)
        run("no remat + budget 0.17, B=256", remat=False, budget=0.17,
            B=256)
        run("no remat + budget 0.17, B=384", remat=False, budget=0.17,
            B=384)
        run("dots_saveable + budget 0.17, B=256",
            remat_policy="dots_saveable", budget=0.17, B=256)
        run("remat full + budget 0.17, B=256", budget=0.17, B=256)
    elif which == "selective":
        # selective remat: stash everything except the [B, N, S, S]
        # attention tensors (recomputed in backward) — targets the ~45
        # ms/step of dynamic-update-slice stash fusions in the no-remat
        # trace while paying only one QK^T + exp recompute per layer
        run("no remat + budget 0.17 (ref)", remat=False, budget=0.17)
        run("no_save attn scores+probs, budget 0.17",
            remat_policy="no_save:attn_scores,attn_probs", budget=0.17)
        run("no_save attn scores only, budget 0.17",
            remat_policy="no_save:attn_scores", budget=0.17)
        run("no_save scores+probs, B=256",
            remat_policy="no_save:attn_scores,attn_probs", budget=0.17,
            B=256)


if __name__ == "__main__":
    main()
