"""BM25-warmup finetuning: dual encoder on raw MS MARCO triples.

Rebuild of reference warmup/drivers/run_bm25_warmup.py:47-320: stream the
(query \t positive \t negative) text triples, tokenize on the fly, train the
2-way NLL with LAMB + linear warmup, checkpoint every save_steps, optional
in-training dev eval. Epochs re-seek the stream (f.seek(0), :189-192);
rank sharding is by line index.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, Iterator, Optional

import numpy as np

from cocodr_tpu.data.streams import parse_triples_tsv_line
from cocodr_tpu.utils.train_state import (
    TrainState,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


@dataclasses.dataclass
class WarmupConfig:
    max_seq_len: int = 128  # triples tokenized at one length (run_bm25_warmup.sh)
    batch_size: int = 32
    num_epochs: int = 3
    save_steps: int = 10000
    eval_every_steps: int = 0  # 0 disables
    max_steps: int = 0  # 0 = until epochs exhausted
    log_every: int = 100
    keep_checkpoints: int = 3


class TripleTextBatcher:
    """Tokenize raw triples into device-ready arrays (offline-rate path;
    preprocessed record streams bypass this entirely)."""

    def __init__(self, tokenizer, max_len: int):
        self.tok = tokenizer
        self.max_len = max_len

    def encode_batch(self, texts):
        out = self.tok(
            texts,
            padding="max_length",
            truncation=True,
            max_length=self.max_len,
            return_tensors="np",
        )
        return (
            out["input_ids"].astype(np.int32),
            out["attention_mask"].astype(np.int32),
        )

    def collate(self, triples):
        qs, ps, ns = zip(*triples)
        q_ids, q_mask = self.encode_batch(list(qs))
        p_ids, p_mask = self.encode_batch(list(ps))
        n_ids, n_mask = self.encode_batch(list(ns))
        return {
            "q_ids": q_ids,
            "q_mask": q_mask,
            "pos_ids": p_ids,
            "pos_mask": p_mask,
            "neg_ids": n_ids,
            "neg_mask": n_mask,
        }


def stream_triples(
    path: str, rank: int = 0, world_size: int = 1
) -> Iterator[tuple]:
    with open(path, encoding="utf8") as f:
        for i, line in enumerate(f):
            if i % world_size != rank:
                continue
            try:
                yield parse_triples_tsv_line(line)
            except ValueError:
                continue


def run_warmup(
    state: TrainState,
    train_step: Callable,
    triples_path: str,
    tokenizer,
    cfg: WarmupConfig,
    ckpt_dir: str,
    eval_fn: Optional[Callable] = None,
    log_fn: Optional[Callable] = None,
    resume: bool = True,
    dropout_seed: Optional[int] = 0,
    device_put: Optional[Callable] = None,
    saver=None,
):
    """Returns the final TrainState. eval_fn(state) -> dict is called every
    cfg.eval_every_steps; log_fn(step, metrics) every cfg.log_every.

    dropout_seed: trains with dropout active (per-step key folded from the
    seed and the global step, so resume reproduces the same draws) — the
    reference finetunes with HF-default dropout 0.1
    (ANCE/model/models.py:194-232). None trains deterministically.
    saver: a utils.train_state.AsyncSaver for non-blocking checkpoints
    (the DONE-marker protocol is preserved); None saves synchronously."""
    import jax
    import jax.numpy as jnp

    os.makedirs(ckpt_dir, exist_ok=True)
    if resume:
        ck = latest_checkpoint(ckpt_dir)
        if ck:
            state = load_checkpoint(ck, state)

    batcher = TripleTextBatcher(tokenizer, cfg.max_seq_len)
    dropout_key = (
        jax.random.PRNGKey(dropout_seed) if dropout_seed is not None else None
    )
    # deterministic resume: fast-forward the batches the restored step
    # already consumed (reference warmup driver :195-198). Skipping happens
    # BEFORE collation so resume costs file-read speed, not a full HF
    # tokenization pass over every skipped batch.
    skip = int(state.step)
    step = int(state.step)

    def collate_stream():
        nonlocal skip
        buf = []
        for epoch in range(cfg.num_epochs):
            for triple in stream_triples(triples_path):
                buf.append(triple)
                if len(buf) < cfg.batch_size:
                    continue
                triples, buf = buf, []
                if skip > 0:
                    skip -= 1
                    continue
                yield epoch, batcher.collate(triples)

    # tokenization runs prefetch-deep on a background thread so the device
    # never waits on the HF tokenizer (the reference tokenizes offline; our
    # raw-text path must not serialize tokenize->step)
    from cocodr_tpu.data.prefetch import prefetch

    for _epoch, arrays in prefetch(collate_stream(), depth=2,
                                   device_put=False):
        batch = {k: jnp.asarray(v) for k, v in arrays.items()}
        if device_put is not None:
            batch = device_put(batch)
        if dropout_key is not None:
            state, metrics = train_step(
                state, batch, jax.random.fold_in(dropout_key, step)
            )
        else:
            state, metrics = train_step(state, batch)
        step = int(state.step)
        if log_fn and step % cfg.log_every == 0:
            log_fn(step, {k: float(np.asarray(v)) for k, v in metrics.items()})
        if cfg.save_steps and step % cfg.save_steps == 0:
            (saver.save if saver else save_checkpoint)(
                ckpt_dir, state, keep=cfg.keep_checkpoints)
        if eval_fn and cfg.eval_every_steps and step % cfg.eval_every_steps == 0:
            eval_fn(state)
        if cfg.max_steps and step >= cfg.max_steps:
            break
    (saver.save if saver else save_checkpoint)(
        ckpt_dir, state, keep=cfg.keep_checkpoints)
    if saver:
        saver.wait()
    return state
