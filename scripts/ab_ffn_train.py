#!/usr/bin/env python
"""A/B: ffn_impl fused vs dense in the TRAINING step.

The pallas FFN kernels (ops/pallas_ffn) define recompute-through-XLA
backwards. Under the train step's remat the forward is ALSO re-run in
the backward pass, so the fused forward's VMEM win may be paid back
twice: (1) remat re-runs the pallas fwd, (2) the custom VJP re-runs the
XLA fwd before differentiating it. The dense impl lets XLA AD handle
everything. This probe measures nll + idro step throughput both ways.
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder


def run(ffn_impl, loss_kind="nll", batch=64, seq=128, q_seq=64, iters=10):
    from cocodr_tpu.optim import lamb, warmup_linear
    from cocodr_tpu.pipelines.train_step import (
        TrainStepConfig,
        build_train_step,
    )
    from cocodr_tpu.utils.train_state import TrainState

    cfg = dataclasses.replace(
        BertConfig(), dtype=jnp.bfloat16, remat=True, ffn_impl=ffn_impl
    )
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
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            state, m = step(state, b)
        _ = float(m["loss"])
        best = min(best, (time.time() - t0) / iters)
    return batch / best


def main():
    for loss_kind in ("nll", "idro"):
        for impl in ("fused", "dense"):
            qps = run(impl, loss_kind)
            print(f"{loss_kind:5s} ffn_impl={impl:6s}: "
                  f"{qps:8.1f} triplets/s", flush=True)


if __name__ == "__main__":
    main()
