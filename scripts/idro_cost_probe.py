"""Where do the idro step's 6.4x (vs nll) go? Time variants on-chip.

Measured (one v5e, B=64 S=128 bert-base bf16, remat on, best-of-3):
see docs/performance.md after running.
"""
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder
from cocodr_tpu.losses import DroConfig, idro_init
from cocodr_tpu.optim import lamb, warmup_linear
from cocodr_tpu.pipelines.train_step import TrainStepConfig, build_train_step
from cocodr_tpu.utils.train_state import TrainState


def make(loss_kind, n_groups=10, last_k=3, remat=True, batch=64, seq=128,
         lane=False):
    cfg = dataclasses.replace(BertConfig(), dtype=jnp.bfloat16, remat=remat)
    model = build_dual_encoder("rdot_nll_condenser", cfg)
    ids = jnp.ones((batch, seq), jnp.int32)
    mask = jnp.ones((batch, seq), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids[:1], mask[:1])["params"]
    tx = lamb(warmup_linear(2e-4, 1000, 100000))
    extra = None
    scfg = TrainStepConfig(loss_kind=loss_kind)
    if loss_kind == "idro":
        dro = DroConfig(n_groups=n_groups)
        scfg = TrainStepConfig(
            loss_kind="idro", dro=dro, idro_last_k_layers=last_k,
            idro_lane_group_pass=lane,
        )
        extra = idro_init(dro)
    state = jax.device_put(TrainState.create(params, tx, extra=extra))
    step = build_train_step(model, tx, scfg)
    b = {
        "q_ids": ids, "q_mask": mask, "pos_ids": ids, "pos_mask": mask,
        "neg_ids": ids, "neg_mask": mask,
    }
    if loss_kind == "idro":
        b["groups"] = jnp.arange(batch, dtype=jnp.int32) % n_groups
    return step, state, jax.device_put(b), batch


def bench(tag, step, state, b, batch, iters=10):
    t0 = time.time()
    state, m = step(state, b)
    _ = float(m["loss"])
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            state, m = step(state, b)
        _ = float(m["loss"])
        best = min(best, (time.time() - t0) / iters)
    print(f"{tag:40s} {batch / best:8.1f} tri/s  ({best * 1e3:7.1f} ms/step,"
          f" compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    for tag, kw in [
        ("idro G=10 K=3 gram", dict(loss_kind="idro")),
        ("idro G=50 K=3 gram (ref n_groups)",
         dict(loss_kind="idro", n_groups=50)),
        ("idro G=50 K=3 full-depth (old)",
         dict(loss_kind="idro", n_groups=50, lane=True)),
    ]:
        try:
            bench(tag, *make(**kw))
        except Exception as e:
            print(f"{tag:40s} FAILED: {str(e)[:150]}", flush=True)
