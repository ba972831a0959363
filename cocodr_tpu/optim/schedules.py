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


def episode_rewarmup(base_lr: float, warmup_steps: int,
                     steps_per_episode: int, total_steps: int,
                     floor: float = 0.2):
    """ANCE re-warmup: each mining episode restarts the LR warmup, while the
    base LR decays with overall progress (reference ANCE/drivers/
    run_ann.py:120-125 decay + :248-266 optional re-warmup on new ann data).
    """
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        in_ep = jnp.mod(step, steps_per_episode)
        warm = jnp.clip(in_ep / jnp.maximum(1.0, warmup_steps), 0.0, 1.0)
        decay = jnp.maximum(floor, 1.0 - step / total_steps)
        return base_lr * warm * decay

    return fn


def episode_decay(base_lr: float, warmup_steps: int, total_steps: int,
                  floor: float = 0.2, episode_steps: int = 0):
    """ANCE episode LR decay WITHOUT re-warmup: one initial warmup, then the
    LR follows max(floor, 1 - step/total) — the factor the reference applies
    when (re)building the optimizer at each new mining episode
    (ANCE/drivers/run_ann.py:120-125, utils/misc.episode_lr_decay).

    episode_steps > 0 freezes the factor at each episode's FIRST step for
    the whole episode (the reference computes it once per episode at
    optimizer build time); 0 decays continuously per step."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.clip(step / jnp.maximum(1.0, warmup_steps), 0.0, 1.0)
        eff = (
            jnp.floor(step / episode_steps) * episode_steps
            if episode_steps > 0 else step
        )
        decay = jnp.maximum(floor, 1.0 - eff / total_steps)
        return base_lr * warm * decay

    return fn


def warmup_constant(base_lr: float, warmup_steps: int):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        return base_lr * jnp.clip(step / jnp.maximum(1.0, warmup_steps), 0.0, 1.0)

    return fn
