#!/usr/bin/env python
"""A/B: does concatenating the pos+neg towers into ONE [2B, S] body_emb
forward beat two separate [B, S] forwards inside the triplet train step?

Hypothesis: body_emb at B=64/S=128 under-fills the MXU pipeline; one
[128, 128] forward+backward should run at better MFU and halve the number
of scan-stacked layer launches in both directions.

Dropout note: the reference draws independent masks per tower
(three separate torch forwards). Flax dropout is elementwise over the
whole [2B, S, H] tensor, so a fused forward still gives every row an
independent mask — semantics preserved (pos vs neg masks differ), though
the exact mask bits differ from the 2-forward version. Deterministic mode
is bit-identical.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import optax

from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder
from cocodr_tpu.optim import lamb, warmup_linear
from cocodr_tpu.losses.nll import triplet_nll
from cocodr_tpu.utils.train_state import TrainState

B, S, QS = 64, 128, 64


def make_step(model, tx, fused: bool):
    def step(state, batch):
        def loss_fn(p):
            def apply(ids, mask, method):
                return model.apply(
                    {"params": p}, ids, mask, deterministic=True,
                    method=method,
                )

            q = apply(batch["q_ids"], batch["q_mask"], model.query_emb)
            if fused:
                ids = jnp.concatenate([batch["pos_ids"], batch["neg_ids"]])
                mask = jnp.concatenate([batch["pos_mask"], batch["neg_mask"]])
                ab = apply(ids, mask, model.body_emb)
                a, b = ab[:B], ab[B:]
            else:
                a = apply(batch["pos_ids"], batch["pos_mask"], model.body_emb)
                b = apply(batch["neg_ids"], batch["neg_mask"], model.body_emb)
            loss, acc, _ = triplet_nll(q, a, b)
            return loss.mean(), acc.mean()

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        ), loss

    return jax.jit(step, donate_argnums=0)


def bench(fused):
    cfg = dataclasses.replace(BertConfig(), dtype=jnp.bfloat16, remat=True)
    model = build_dual_encoder("rdot_nll_condenser", cfg)
    ids = jnp.ones((B, S), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids[:1], mask[:1])["params"]
    tx = lamb(warmup_linear(2e-4, 1000, 100000))
    state = jax.device_put(TrainState.create(params, tx))
    batch = jax.device_put({
        "q_ids": jnp.ones((B, QS), jnp.int32),
        "q_mask": jnp.ones((B, QS), jnp.int32),
        "pos_ids": ids, "pos_mask": mask,
        "neg_ids": ids, "neg_mask": mask,
    })
    step = make_step(model, tx, fused)
    state, loss = step(state, batch)
    _ = float(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(10):
            state, loss = step(state, batch)
        _ = float(loss)
        best = min(best, (time.time() - t0) / 10)
    return B / best


if __name__ == "__main__":
    base = bench(fused=False)
    fused = bench(fused=True)
    print(f"separate towers: {base:8.1f} triplets/s")
    print(f"fused pos+neg:   {fused:8.1f} triplets/s  ({fused / base:.3f}x)")
