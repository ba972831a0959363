"""Triplet 2-way softmax NLL — the warmup/ANCE training loss.

Rebuild of `NLL.forward_model` (reference ANCE/model/models.py:80-115,
warmup/model/models.py:66-99): logits = [q·d+, q·d-], loss = -log_softmax[0].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def triplet_nll(q_emb, pos_emb, neg_emb):
    """Per-sample 2-way NLL.

    q_emb/pos_emb/neg_emb: [B, D]. Returns (loss [B], acc [B], logits [B,2]).
    acc is 1 where the positive outranks the negative (the reference returns
    argmax and counts zeros, ANCE/model/models.py:107-115).
    """
    pos = jnp.sum(
        q_emb.astype(jnp.float32) * pos_emb.astype(jnp.float32), axis=-1
    )
    neg = jnp.sum(
        q_emb.astype(jnp.float32) * neg_emb.astype(jnp.float32), axis=-1
    )
    logits = jnp.stack([pos, neg], axis=1)  # [B, 2]
    lsm = jax.nn.log_softmax(logits, axis=1)
    loss = -lsm[:, 0]
    acc = (jnp.argmax(logits, axis=1) == 0).astype(jnp.float32)
    return loss, acc, logits


def triplet_nll_multichunk(q_emb, pos_chunk_emb, pos_chunk_mask,
                           neg_chunk_emb, neg_chunk_mask):
    """Multi-chunk variant: doc score = max over chunks with -9999 pad bias
    (reference ANCE/model/models.py:307-357)."""
    from cocodr_tpu.models.dual_encoder import chunk_max_score

    pos = chunk_max_score(q_emb, pos_chunk_emb, pos_chunk_mask)
    neg = chunk_max_score(q_emb, neg_chunk_emb, neg_chunk_mask)
    logits = jnp.stack([pos, neg], axis=1)
    lsm = jax.nn.log_softmax(logits, axis=1)
    loss = -lsm[:, 0]
    acc = (jnp.argmax(logits, axis=1) == 0).astype(jnp.float32)
    return loss, acc, logits
