"""LR schedules with HF-transformers semantics (the reference uses
`get_linear_schedule_with_warmup` / cosine, warmup/drivers/run_bm25_warmup.py:100-108)."""
from __future__ import annotations

import jax.numpy as jnp


def warmup_linear(base_lr: float, warmup_steps: int, total_steps: int):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = (total_steps - step) / jnp.maximum(
            1.0, total_steps - warmup_steps
        )
        return base_lr * jnp.clip(jnp.minimum(warm, decay), 0.0, 1.0)

    return fn


def warmup_cosine(base_lr: float, warmup_steps: int, total_steps: int,
                  num_cycles: float = 0.5):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.clip(step / jnp.maximum(1.0, warmup_steps), 0.0, 1.0)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, total_steps - warmup_steps
        )
        progress = jnp.clip(progress, 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * num_cycles * progress))
        return base_lr * jnp.where(step < warmup_steps, warm, jnp.maximum(0.0, cos))

    return fn


def warmup_constant(base_lr: float, warmup_steps: int):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        return base_lr * jnp.clip(step / jnp.maximum(1.0, warmup_steps), 0.0, 1.0)

    return fn
