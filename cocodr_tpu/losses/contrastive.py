"""coCondenser global contrastive loss over the mesh data axis.

Rebuild of `CoCondenserForPretraining.compute_contrastive_loss`
(reference COCO/modeling.py:172-190,207-208,244-248):

- each document contributes 2 spans; CLS embeddings of all spans on all
  devices form the candidate pool.
- targets pair up consecutive spans with flipped order: span 2i matches
  2i+1 and vice versa (`torch.arange(...).view(-1,2).flip([1])`,
  COCO/modeling.py:177).
- the diagonal (self-similarity) is masked to -inf.

Two forms:
- `axis_name=None`: global math over the full (possibly pjit-sharded) batch.
  Under pjit this is the idiomatic TPU formulation — XLA inserts the
  all-gather for the candidate side and the gradient is exact.
- `axis_name='data'`: explicit-collective form for shard_map: each device
  scores its LOCAL rows against the all-gathered global candidates
  ([B_local, B_global] sims instead of [B_global, B_global] everywhere) and
  pmeans. The reference's ×world_size rescale + DDP grad averaging
  (COCO/modeling.py:185,247) reduces to exactly this gradient — verified
  numerically in tests/test_losses.py.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def flipped_pair_targets(n: int):
    """[1,0,3,2,5,4,...] of length n (n even)."""
    t = jnp.arange(n, dtype=jnp.int32).reshape(-1, 2)
    return t[:, ::-1].reshape(-1)


def _pairwise_ce(sim, targets, self_cols):
    """Row-wise CE with self-column masked to -inf.

    sim [R, C] fp32; targets [R] global col ids; self_cols [R] col to mask.
    """
    cols = jnp.arange(sim.shape[1])[None, :]
    sim = jnp.where(cols == self_cols[:, None], -jnp.inf, sim)
    lsm = jax.nn.log_softmax(sim, axis=-1)
    return -jnp.take_along_axis(lsm, targets[:, None], axis=-1)[:, 0]


def co_contrastive_loss(
    cls_emb,
    axis_name: Optional[str] = None,
    reduction: str = "mean",
):
    """Contrastive loss over span CLS embeddings (2 consecutive spans/doc).

    Without axis_name: cls_emb is the full [B, D] batch (global math).
    With axis_name: cls_emb is this device's [B_local, D] shard inside
    shard_map; candidates are all-gathered over the axis. Pairs must not
    straddle devices (B_local even — guaranteed by the collator).
    """
    f32 = cls_emb.astype(jnp.float32)
    if axis_name is None:
        n = f32.shape[0]
        sim = jnp.matmul(f32, f32.T, preferred_element_type=jnp.float32)
        loss = _pairwise_ce(sim, flipped_pair_targets(n), jnp.arange(n))
        if reduction == "none":
            return loss
        return jnp.mean(loss)

    B = f32.shape[0]
    cands = jax.lax.all_gather(f32, axis_name).reshape(-1, f32.shape[-1])
    offset = jax.lax.axis_index(axis_name) * B
    sim = jnp.matmul(f32, cands.T, preferred_element_type=jnp.float32)
    local_ids = jnp.arange(B)
    targets = offset + flipped_pair_targets(B)
    loss = _pairwise_ce(sim, targets, offset + local_ids)
    if reduction == "none":
        return loss
    return jax.lax.pmean(jnp.mean(loss), axis_name)
