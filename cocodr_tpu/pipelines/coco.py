"""COCO continuous contrastive pretraining driver.

Rebuild of reference COCO/run_coco_pre_training.py + COCO/trainer.py:
coCondenser loss (Condenser MLM + span contrastive) over 2-spans-per-doc
batches, with an optional gradient-cache mode for contrastive batches larger
than memory (reference COCO/trainer.py:142-192 + the GradCache package).

Grad-cache, TPU-native: the reference's two-pass trick becomes
  1. chunked no-grad CLS encode of the full batch (lax.map over chunks);
  2. loss + d(co_loss)/d(cls) on the [B, D] embeddings (tiny);
  3. one lax.scan over chunks accumulating
         grad( mlm_chunk_sum/B_total + <cached_grad_chunk, cls_chunk> )
     — activations live for one chunk at a time; the surrogate dot injects
     the cached cotangents exactly like the reference's
     `torch.dot(cached_grads, cls)` (COCO/modeling.py:231-235).
The summed result equals the full-batch gradient (verified in
tests/test_coco.py against the direct computation).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cocodr_tpu.losses.contrastive import co_contrastive_loss
from cocodr_tpu.utils.train_state import TrainState


@dataclasses.dataclass(frozen=True)
class CocoConfig:
    max_seq_length: int = 128
    mlm_probability: float = 0.15
    batch_size: int = 64  # spans (= 2x documents)
    late_mlm: bool = True
    cache_chunk_size: int = 0  # 0 = no grad cache
    max_grad_norm: float = 1.0


def build_coco_train_step(model, tx, cfg: CocoConfig) -> Callable:
    """model: CoCondenserForPretraining. Returns
    step(state, batch, rng) -> (state, metrics)."""
    clip = (
        optax.clip_by_global_norm(cfg.max_grad_norm)
        if cfg.max_grad_norm > 0
        else None
    )

    def apply_grads(state, grads):
        if clip is not None:
            grads, _ = clip.update(grads, optax.EmptyState())
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state,
        )

    if cfg.cache_chunk_size <= 0:

        def step(state: TrainState, batch, rng):
            def loss_fn(p):
                loss, aux = model.apply(
                    {"params": p},
                    batch["input_ids"],
                    batch["attention_mask"],
                    batch["labels"],
                    deterministic=False,
                    rngs={"dropout": rng},
                    method=model.loss_with_contrastive,
                )
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            state = apply_grads(state, grads)
            return state, {
                "loss": loss,
                "mlm_loss": aux["head_mlm_loss"],
                "co_loss": aux["co_loss"],
            }

        return jax.jit(step)

    C = cfg.cache_chunk_size
    if cfg.batch_size % C:
        raise ValueError(
            f"grad-cache needs batch_size divisible by cache_chunk_size "
            f"({cfg.batch_size} % {C} != 0)"
        )

    def step(state: TrainState, batch, rng):
        B = batch["input_ids"].shape[0]
        n_chunks = B // C
        chunks = jax.tree_util.tree_map(
            lambda x: x.reshape(n_chunks, C, *x.shape[1:]), batch
        )
        rngs = jax.random.split(rng, n_chunks)

        # pass 1: no-grad chunked CLS encode
        def enc_chunk(args):
            ch, r = args
            return model.apply(
                {"params": state.params},
                ch["input_ids"],
                ch["attention_mask"],
                deterministic=False,
                rngs={"dropout": r},
                method=model.cls_emb,
            )

        cls = jax.lax.map(enc_chunk, (chunks, rngs)).reshape(B, -1)

        # contrastive loss + cached cotangents on the embeddings
        co_loss, cls_grads = jax.value_and_grad(
            lambda c: co_contrastive_loss(c)
        )(cls.astype(jnp.float32))
        cls_grads = cls_grads.reshape(n_chunks, C, -1)

        # pass 2: re-forward per chunk with the surrogate, accumulate grads.
        # MLM is accumulated token-weighted: each chunk contributes
        # chunk_mean * (chunk_masked / total_masked), so the sum equals the
        # full-batch token-weighted MLM mean (and its gradient) even when
        # chunks carry unequal masked-token counts.
        total_masked = jnp.maximum(
            1.0, jnp.sum(batch["labels"] != -100).astype(jnp.float32)
        )

        def chunk_grads(carry, args):
            ch, r, cg = args
            w = (
                jnp.sum(ch["labels"] != -100).astype(jnp.float32)
                / total_masked
            )

            def loss_fn(p):
                mlm_loss, aux = model.apply(
                    {"params": p},
                    ch["input_ids"],
                    ch["attention_mask"],
                    ch["labels"],
                    deterministic=False,
                    rngs={"dropout": r},
                )
                surrogate = jnp.vdot(cg, aux["cls"].astype(jnp.float32))
                return mlm_loss * w + surrogate, mlm_loss * w

            (val, mlm_piece), g = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            acc_g, acc_mlm = carry
            return (
                jax.tree_util.tree_map(jnp.add, acc_g, g),
                acc_mlm + mlm_piece,
            ), None

        zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (grads, mlm_loss), _ = jax.lax.scan(
            chunk_grads, (zero, jnp.zeros(())), (chunks, rngs, cls_grads)
        )
        state = apply_grads(state, grads)
        return state, {
            "loss": mlm_loss + co_loss,
            "mlm_loss": mlm_loss,
            "co_loss": co_loss,
        }

    return jax.jit(step)


def run_coco_pretrain(
    state: TrainState,
    train_step: Callable,
    span_batches: Iterator[Dict[str, np.ndarray]],
    rng,
    max_steps: int,
    log_fn: Optional[Callable] = None,
    log_every: int = 50,
    ckpt_dir: Optional[str] = None,
    save_steps: int = 0,
    device_put: Optional[Callable] = None,
    saver=None,
    keep_checkpoints: int = 3,
):
    """device_put: shards each host batch over the mesh data axis (from
    parallel.sharded_train.shard_train_setup) — the coCondenser global
    contrastive batch then spans the whole mesh, with GSPMD inserting the
    CLS all-gather the reference does by hand (COCO/modeling.py:182-190).

    Resume: the caller restores `state` from the latest DONE checkpoint and
    fast-forwards `span_batches` (coco_spans.span_batches(start_batch=...));
    per-step dropout keys are folded from (rng, global step), so a resumed
    run replays the exact key sequence of an uninterrupted one (mirrors
    pipelines/warmup.run_warmup).

    saver: utils.train_state.AsyncSaver for non-blocking checkpoints with
    the DONE-marker protocol; None saves synchronously."""
    from cocodr_tpu.utils.train_state import save_checkpoint

    step = int(state.step)
    for batch in span_batches:
        step_rng = jax.random.fold_in(rng, step)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        if device_put is not None:
            jb = device_put(jb)
        state, metrics = train_step(state, jb, step_rng)
        step = int(state.step)
        if log_fn and step % log_every == 0:
            log_fn(step, {k: float(np.asarray(v)) for k, v in metrics.items()})
        if ckpt_dir and save_steps and step % save_steps == 0:
            (saver.save if saver else save_checkpoint)(
                ckpt_dir, state, keep=keep_checkpoints)
        if step >= max_steps:
            break
    if ckpt_dir:
        (saver.save if saver else save_checkpoint)(
            ckpt_dir, state, keep=keep_checkpoints)
    if saver:
        saver.wait()
    return state
