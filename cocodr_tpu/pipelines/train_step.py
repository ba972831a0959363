"""Jitted training-step factory for the dual-encoder stages.

One compiled SPMD program per stage covering the reference's training modes
(reference ANCE/drivers/run_ann.py:289-356, warmup/drivers/run_bm25_warmup.py:208-253):

- 'nll'        : triplet 2-way NLL, optional per-sample weights
                 (ANCE/model/models.py:259-262)
- 'dro-greedy' : DRO-greedy robust loss over query clusters
- 'idro'       : iDRO — per-group gradients restricted to the last-k encoder
                 layers feed the multiplicative weight update
                 (ANCE/model/dro_loss.py:174-254)
- 'nll_multichunk' : long-doc triplet NLL — pos/neg docs arrive as C
                 concatenated chunks [B, C*L]; doc score = max over chunk
                 scores with -9999 bias on all-pad chunks
                 (ANCE/model/models.py:307-399, NLL_MultiChunk)

Under pjit the batch is sharded over the mesh data axis and params are
replicated; XLA inserts the gradient reductions the reference got from DDP.
The per-group gradients use ONE vjp whose pullback is vmapped over group
cotangents — the reference's O(G) sequential autograd.grad calls become a
single batched backward, and dead-code elimination prunes the below-last-k
backward for the per-group pass (only the robust-loss pullback needs it).

Note on the reference's "layerwise" LAMB param groups
(warmup/drivers/run_bm25_warmup.py:65-79): the groups share every
hyperparameter, so param GROUPING has no numerical effect. LAMB's trust
ratio IS per-tensor though, and our scan-stacked encoder fuses the L
per-layer tensors into [L, ...] leaves — optim/lamb.py computes the trust
ratio per leading-axis slice on those leaves to match the reference's
per-layer-tensor dynamics (verified end-to-end by
tests/test_trajectory_parity.py).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from cocodr_tpu.losses import (
    DroConfig,
    dro_greedy_loss,
    idro_loss,
    per_group_grads,
    triplet_nll,
)
from cocodr_tpu.losses.nll import triplet_nll_multichunk
from cocodr_tpu.utils.train_state import TrainState


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    loss_kind: str = "nll"  # 'nll' | 'dro-greedy' | 'idro'
    dro: Optional[DroConfig] = None
    max_grad_norm: float = 1.0  # 0 disables clipping
    idro_last_k_layers: int = 3  # base: last 3; large: last 2 (dro_loss.py:179-183)
    # Force the lane group pass (G vmapped top-K backward lanes) instead of
    # the Gram fast path (debug / numerics escape hatch; O(G) vs O(1) in
    # group count — see scripts/idro_cost_probe.py). Equivalence is tested
    # in tests/test_train_step.py::test_idro_group_pass_variants_match.
    idro_lane_group_pass: bool = False
    # Lane-pass memory bounds: lanes are vmapped in chunks of this many
    # (lax.map over chunks) — one flat vmap of G=50 K=3-layer bert-base
    # backwards OOMs the compiler at B=64 (device-measured, round 5) —
    # and each lane's flattened [P] grads are stored in this dtype
    # ([G,P] is 4.2GB f32 at base K=3 G=50; bf16 halves it, the Gram /
    # normalization math stays f32). 0 = flat vmap (small-G / tests).
    idro_lane_chunk: int = 8
    idro_lane_grad_dtype: str = "bfloat16"


def _embed_triplet(model, params, batch, dropout_rng=None):
    det = dropout_rng is None

    def apply(ids, mask, method, tower):
        # distinct key per tower: the reference's three torch forwards draw
        # INDEPENDENT dropout masks; a shared rngs dict would give the pos
        # and neg towers byte-identical masks (same module paths)
        rngs = (
            None if det
            else {"dropout": jax.random.fold_in(dropout_rng, tower)}
        )
        return model.apply(
            {"params": params}, ids, mask, deterministic=det,
            method=method, rngs=rngs,
        )

    q = apply(batch["q_ids"], batch["q_mask"], model.query_emb, 0)
    a = apply(batch["pos_ids"], batch["pos_mask"], model.body_emb, 1)
    b = apply(batch["neg_ids"], batch["neg_mask"], model.body_emb, 2)
    return q, a, b


def split_last_k_layers(params, k: int):
    """Split scan-stacked encoder layer params into (last_k, rest_fn) where
    rest_fn(last_k) rebuilds the full tree. Works on the DualEncoder tree
    (params['encoder']['encoder']['layers']['layer'])."""
    enc = params["encoder"]["encoder"]["layers"]["layer"]
    lastk = jax.tree_util.tree_map(lambda x: x[-k:], enc)

    def rebuild(lk):
        merged = jax.tree_util.tree_map(
            lambda full, tail: jnp.concatenate([full[:-k], tail], axis=0),
            enc,
            lk,
        )
        new = dict(params)
        new_enc_outer = dict(params["encoder"])
        new_enc = dict(params["encoder"]["encoder"])
        new_layers = dict(params["encoder"]["encoder"]["layers"])
        new_layers["layer"] = merged
        new_enc["layers"] = new_layers
        new_enc_outer["encoder"] = new_enc
        new["encoder"] = new_enc_outer
        return new

    return lastk, rebuild


def build_train_step(
    model,
    tx: optax.GradientTransformation,
    cfg: TrainStepConfig = TrainStepConfig(),
) -> Callable:
    """Returns train_step(state, batch, dropout_rng) -> (state, metrics).

    batch keys: q_ids/q_mask/pos_ids/pos_mask/neg_ids/neg_mask
    [+ groups, weights]. state.extra holds DroState for the DRO modes.
    """
    clip = (
        optax.clip_by_global_norm(cfg.max_grad_norm)
        if cfg.max_grad_norm > 0
        else None
    )

    def apply_updates(state, grads, extra):
        if clip is not None:
            grads, _ = clip.update(grads, optax.EmptyState())
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            extra=extra,
        )

    if cfg.loss_kind == "nll":

        def step(state: TrainState, batch, dropout_rng=None):
            def loss_fn(p):
                q, a, b = _embed_triplet(model, p, batch, dropout_rng)
                losses, acc, _ = triplet_nll(q, a, b)
                w = batch.get("weights")
                if w is not None:
                    losses = losses * w
                return jnp.mean(losses), jnp.mean(acc)

            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            state = apply_updates(state, grads, state.extra)
            return state, {"loss": loss, "acc": acc}

        return jax.jit(step)

    if cfg.loss_kind == "nll_multichunk":

        def step(state: TrainState, batch, dropout_rng=None):
            def loss_fn(p):
                # body_emb folds [B, C*L] -> per-chunk embeddings [B, C, D]
                q, a, b = _embed_triplet(model, p, batch, dropout_rng)
                C = a.shape[1]
                # a chunk is real iff it has any live token — the reference
                # derives the -9999 bias from per-chunk mask sums
                # (ANCE/model/models.py:326-357)
                pos_cm = (
                    batch["pos_mask"].reshape(q.shape[0], C, -1).sum(-1) > 0
                )
                neg_cm = (
                    batch["neg_mask"].reshape(q.shape[0], C, -1).sum(-1) > 0
                )
                losses, acc, _ = triplet_nll_multichunk(
                    q, a, pos_cm, b, neg_cm
                )
                w = batch.get("weights")
                if w is not None:
                    losses = losses * w
                return jnp.mean(losses), jnp.mean(acc)

            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            state = apply_updates(state, grads, state.extra)
            return state, {"loss": loss, "acc": acc}

        return jax.jit(step)

    if cfg.loss_kind == "dro-greedy":
        assert cfg.dro is not None

        def step(state: TrainState, batch, dropout_rng=None):
            def loss_fn(p, dstate):
                q, a, b = _embed_triplet(model, p, batch, dropout_rng)
                losses, acc, _ = triplet_nll(q, a, b)
                robust, new_dstate, (gl, gc) = dro_greedy_loss(
                    losses,
                    batch["groups"],
                    dstate,
                    cfg.dro,
                    weights=batch.get("weights"),
                )
                return robust, (new_dstate, jnp.mean(acc), gl, gc)

            (loss, (dstate, acc, gl, gc)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.extra)
            state = apply_updates(state, grads, dstate)
            return state, {
                "loss": loss,
                "acc": acc,
                "group_losses": gl,
                "group_counts": gc,
            }

        return jax.jit(step)

    if cfg.loss_kind == "idro":
        assert cfg.dro is not None
        G = cfg.dro.n_groups
        K = cfg.idro_last_k_layers
        decfg = getattr(model, "cfg", None)
        bcfg = getattr(decfg, "bert", None)
        # Fast group pass: the per-group grads only cover the last-K encoder
        # layers (reference dro_loss.py:179-183), but the layer stack is one
        # nn.scan — XLA cannot dead-code-eliminate the below-last-K backward
        # out of a scan, so pulling each group's cotangent through the FULL
        # pullback pays a 12-layer backward per group (measured: 72 ms/group
        # at B=64 bert-base, 918 ms/step at G=10 — scripts/idro_cost_probe.py).
        # Instead: capture each tower's layer-(L-K) activations in the main
        # forward, re-run ONLY the top K layers + pooling + head as a
        # separate K-length scan, and vjp that. Each group lane then pays a
        # K-layer backward.
        assert bcfg is not None and K > 0, (
            "idro needs a DualEncoder model and idro_last_k_layers > 0"
        )
        if K > bcfg.num_hidden_layers:
            # Small-L models (e.g. 2-layer test checkpoints with the default
            # K=3): the reference's last-k param selection
            # (dro_loss.py:179-183) degenerates to the full stack. Clamp K=L:
            # capture_layer becomes 0 (the embeddings output — supported, no
            # scan iteration matches i == -1) and the top re-run IS the full
            # stack, so group grads cover every layer, matching the reference.
            K = bcfg.num_hidden_layers
            cfg = dataclasses.replace(cfg, idro_last_k_layers=K)
        fast_group_pass = (
            not cfg.idro_lane_group_pass
            and not decfg.two_tower
            and not decfg.chunk_len
            and decfg.pooling in ("cls", "mean")
        )
        from cocodr_tpu.models.bert import BertEncoder, make_attention_bias
        from cocodr_tpu.models.dual_encoder import ProjectionHead, pool
        if not fast_group_pass:
            return _build_idro_lane_step(
                model, cfg, apply_updates, BertEncoder, make_attention_bias,
                ProjectionHead, pool,
            )

        L = bcfg.num_hidden_layers
        # remat off: K layers of activations at B=64 fit easily, and lanes
        # then share one stored forward instead of re-running it.
        # ffn_impl dense: the group pass vmaps the stack over BROADCAST
        # (per-sample) weights, and the pallas FFN kernels don't lower
        # under a batched-weight vmap (remote compile crashes); the K-layer
        # re-run is small, plain XLA dense ops are fine.
        top_cfg = dataclasses.replace(
            bcfg, num_hidden_layers=K, remat=False, ffn_impl="dense"
        )
        top_stack = BertEncoder(top_cfg)
        proj = (
            ProjectionHead(bcfg, decfg.head_dim) if decfg.use_head else None
        )

        def step(state: TrainState, batch, dropout_rng=None):
            det = dropout_rng is None

            def per_sample(p):
                def apply(ids, mask, method, tower):
                    rngs = (
                        None if det
                        else {"dropout": jax.random.fold_in(dropout_rng, tower)}
                    )
                    return model.apply(
                        {"params": p}, ids, mask, deterministic=det,
                        method=method, rngs=rngs, capture_layer=L - K,
                    )

                q, hq = apply(batch["q_ids"], batch["q_mask"],
                              model.query_emb, 0)
                a, ha = apply(batch["pos_ids"], batch["pos_mask"],
                              model.body_emb, 1)
                b, hb = apply(batch["neg_ids"], batch["neg_mask"],
                              model.body_emb, 2)
                losses, acc, _ = triplet_nll(q, a, b)
                return losses, (jnp.mean(acc), (hq, ha, hb))

            losses, pullback, (acc, hmids) = jax.vjp(
                per_sample, state.params, has_aux=True
            )

            enc = state.params["encoder"]["encoder"]["layers"]["layer"]
            lastk = jax.lax.stop_gradient(
                jax.tree_util.tree_map(lambda x: x[-K:], enc)
            )
            head_p = (
                jax.lax.stop_gradient(state.params["head"])
                if proj is not None else None
            )

            # The h_fun update consumes the per-group grads ONLY through
            # their Gram matrix (norms + normalized inner products — see
            # idro_loss). With per-sample losses, group grads are linear in
            # per-sample grads: M = Cᵀ (J Jᵀ) C with C the group-cotangent
            # matrix. So instead of G backward passes: vmap the top-K
            # re-run per sample over BROADCAST weights — one backward then
            # yields per-sample weight grads [B, ...] — and contract. Cost
            # is one K-layer fwd+bwd, independent of G (the reference runs
            # n_groups=50, where the G-backwards path is ~9x this).
            B = losses.shape[0]
            # towers may use different sequence lengths (the reference
            # trains queries at 64, docs at 128) — pad h_mid/mask to the
            # longest; padded positions are attention-masked and excluded
            # from pooling, so they never reach the loss
            masks = [batch["q_mask"], batch["pos_mask"], batch["neg_mask"]]
            s_max = max(h.shape[1] for h in hmids)
            hp = [
                jnp.pad(h, ((0, 0), (0, s_max - h.shape[1]), (0, 0)))
                for h in hmids
            ]
            mp = [
                jnp.pad(m, ((0, 0), (0, s_max - m.shape[1])))
                for m in masks
            ]
            h3 = jnp.stack(hp, axis=1)  # [B, 3towers, S_max, H]
            m3 = jnp.stack(mp, axis=1)  # [B, 3, S_max]
            keys = (
                jnp.zeros((B, 2), jnp.uint32) if det
                else jax.random.split(jax.random.fold_in(dropout_rng, 7), B)
            )

            def one_sample_loss(p_lastk, h, m, key):
                # NOTE: when dropout is on, the top re-run draws fresh
                # masks (per-sample keys here vs the L-length scan's split
                # in the main forward). Group grads are a stochastic
                # estimate either way; the h_fun update they feed is an EMA.
                rngs = None if det else {"dropout": key}
                last, _ = top_stack.apply(
                    {"params": {"layers": {"layer": p_lastk}}},
                    h, make_attention_bias(m),
                    deterministic=det, rngs=rngs,
                )
                e = pool(last, m, decfg.pooling)  # [3, D]
                if proj is not None:
                    e = proj.apply({"params": head_p}, e)
                l, _, _ = triplet_nll(e[0:1], e[1:2], e[2:3])
                return l[0]

            pb = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (B,) + x.shape), lastk
            )
            _, pull_ps = jax.vjp(
                jax.vmap(one_sample_loss), pb, h3, m3, keys
            )
            per_sample_g = pull_ps(jnp.ones((B,), jnp.float32))[0]
            gram_s = sum(
                (lambda v: v @ v.T)(
                    leaf.reshape(B, -1).astype(jnp.float32)
                )
                for leaf in jax.tree_util.tree_leaves(per_sample_g)
            )  # [B, B] per-sample gradient Gram
            counts_b = jnp.maximum(
                jax.ops.segment_sum(
                    jnp.ones((B,), jnp.float32), batch["groups"],
                    num_segments=G,
                ),
                1.0,
            )
            cmat = (
                jax.nn.one_hot(batch["groups"], G, dtype=jnp.float32)
                / counts_b[None, :]
            )  # [B, G], identical cotangents to per_group_grads
            gram_g = cmat.T @ gram_s @ cmat  # [G, G]

            robust, dstate, (gl, gc) = idro_loss(
                losses, batch["groups"], state.extra, cfg.dro,
                group_gram=gram_g,
            )
            # training gradient via the shared pullback: d(robust)/d(loss_i)
            # = h_pre[g_i] / count_{g_i} (pre-update h_fun — the buffer
            # semantics of the torch module; verified against autodiff in
            # tests/test_dro.py::test_idro_robust_loss_gradient_flows)
            h_pre = state.extra.h_fun
            counts = jnp.maximum(gc, 1.0)
            ct = jax.lax.stop_gradient(
                h_pre[batch["groups"]] / counts[batch["groups"]]
            )
            (grads,) = pullback(ct)
            state = apply_updates(state, grads, dstate)
            return state, {
                "loss": robust,
                "acc": acc,
                "group_losses": gl,
                "group_counts": gc,
            }

        return jax.jit(step)

    raise ValueError(cfg.loss_kind)


def _build_idro_lane_step(
    model, cfg, apply_updates, BertEncoder, make_attention_bias,
    ProjectionHead, pool,
):
    """iDRO lane group pass: capture each tower's layer-(L-K) activations,
    re-run ONLY the top K layers (+ pooling + head, both detached like the
    reference's last-k param selection, dro_loss.py:174-190), and vmap G
    cotangent lanes through that short pullback (per_group_grads).

    O(G) K-layer backwards — more compute than the Gram fast path at large
    G, but each lane's graph is only K layers deep, so it compiles and
    steps at the reference's published n_groups=50 where pulling G
    cotangents through the FULL L-layer scan pullback does not compile
    (docs/performance.md, iDRO section). This is the path for configs the
    Gram pass can't serve: two-tower, multi-chunk, tanh-pooler pooling,
    and per-rank (shard_map) training.
    """
    decfg = model.cfg
    bcfg = decfg.bert
    G, K, L = cfg.dro.n_groups, cfg.idro_last_k_layers, bcfg.num_hidden_layers
    # dense ffn: the lane vmap batches cotangents, pallas FFN kernels don't
    # lower under that vmap (same constraint as the Gram path's re-run)
    top_cfg = dataclasses.replace(
        bcfg, num_hidden_layers=K, remat=False, ffn_impl="dense"
    )
    top_stack = BertEncoder(top_cfg)
    proj = ProjectionHead(bcfg, decfg.head_dim) if decfg.use_head else None
    two_tower = decfg.two_tower
    chunk_len = decfg.chunk_len
    sg = jax.lax.stop_gradient

    def step(state: TrainState, batch, dropout_rng=None):
        det = dropout_rng is None
        B = batch["q_ids"].shape[0]
        # chunked iff the doc inputs are wider than one chunk (mirrors
        # DualEncoder.body_emb's dispatch)
        C = (
            batch["pos_ids"].shape[1] // chunk_len
            if chunk_len and batch["pos_ids"].shape[1] > chunk_len
            else 0
        )

        def chunk_masks():
            pos_cm = batch["pos_mask"].reshape(B, C, -1).sum(-1) > 0
            neg_cm = batch["neg_mask"].reshape(B, C, -1).sum(-1) > 0
            return pos_cm, neg_cm

        def per_sample(p):
            def apply(ids, mask, method, tower):
                rngs = (
                    None if det
                    else {"dropout": jax.random.fold_in(dropout_rng, tower)}
                )
                return model.apply(
                    {"params": p}, ids, mask, deterministic=det,
                    method=method, rngs=rngs, capture_layer=L - K,
                )

            q, hq = apply(batch["q_ids"], batch["q_mask"],
                          model.query_emb, 0)
            a, ha = apply(batch["pos_ids"], batch["pos_mask"],
                          model.body_emb, 1)
            b, hb = apply(batch["neg_ids"], batch["neg_mask"],
                          model.body_emb, 2)
            if C:
                pos_cm, neg_cm = chunk_masks()
                losses, acc, _ = triplet_nll_multichunk(
                    q, a, pos_cm, b, neg_cm
                )
            else:
                losses, acc, _ = triplet_nll(q, a, b)
            return losses, (jnp.mean(acc), (hq, ha, hb))

        losses, pullback, (acc, hmids) = jax.vjp(
            per_sample, state.params, has_aux=True
        )

        def lastk_of(tree):
            enc = tree["encoder"]["layers"]["layer"]
            return sg(jax.tree_util.tree_map(lambda x: x[-K:], enc))

        diff = {"q": lastk_of(state.params["encoder"])}
        if two_tower:
            diff["d"] = lastk_of(state.params["doc_encoder"])

        def pooler_p(key):
            return (
                sg(state.params[key]["pooler"])
                if decfg.pooling == "pooler" else None
            )

        def head_p(key):
            return sg(state.params[key]) if proj is not None else None

        pool_q, head_q = pooler_p("encoder"), head_p("head")
        pool_d = pooler_p("doc_encoder") if two_tower else pool_q
        head_d = head_p("doc_head") if (two_tower and proj) else head_q

        def top_emb(p_lastk, h_mid, mask, tower, pl, hd):
            # dropout note: the top re-run draws fresh masks (a K-length
            # scan splits keys differently from the last K slots of the
            # L-length scan); group grads are a stochastic estimate either
            # way — the h_fun update they feed is an EMA
            rngs = (
                None if det
                else {"dropout": jax.random.fold_in(
                    jax.random.fold_in(dropout_rng, tower), 7
                )}
            )
            last, _ = top_stack.apply(
                {"params": {"layers": {"layer": p_lastk}}},
                h_mid, make_attention_bias(mask),
                deterministic=det, rngs=rngs,
            )
            if decfg.pooling == "pooler":
                e = jnp.tanh(
                    last[:, 0] @ pl["dense"]["kernel"] + pl["dense"]["bias"]
                )
            else:
                e = pool(last, mask, decfg.pooling)
            if proj is not None:
                e = proj.apply({"params": hd}, e)
            return e

        def top_losses(d):
            qlk = d["q"]
            dlk = d["d"] if two_tower else d["q"]
            q = top_emb(qlk, hmids[0], batch["q_mask"], 0, pool_q, head_q)
            if C:
                pm = batch["pos_mask"].reshape(B * C, -1)
                nm = batch["neg_mask"].reshape(B * C, -1)
                a = top_emb(dlk, hmids[1], pm, 1, pool_d, head_d)
                b = top_emb(dlk, hmids[2], nm, 2, pool_d, head_d)
                a = a.reshape(B, C, -1)
                b = b.reshape(B, C, -1)
                pos_cm, neg_cm = chunk_masks()
                l, _, _ = triplet_nll_multichunk(q, a, pos_cm, b, neg_cm)
            else:
                a = top_emb(dlk, hmids[1], batch["pos_mask"], 1,
                            pool_d, head_d)
                b = top_emb(dlk, hmids[2], batch["neg_mask"], 2,
                            pool_d, head_d)
                l, _, _ = triplet_nll(q, a, b)
            return l

        _, pull_top = jax.vjp(top_losses, diff)
        gg = per_group_grads(
            pull_top, batch["groups"], G,
            lane_chunk=cfg.idro_lane_chunk,
            store_dtype=jnp.dtype(cfg.idro_lane_grad_dtype),
        )

        robust, dstate, (gl, gc) = idro_loss(
            losses, batch["groups"], state.extra, cfg.dro, gg
        )
        h_pre = state.extra.h_fun
        counts = jnp.maximum(gc, 1.0)
        ct = jax.lax.stop_gradient(
            h_pre[batch["groups"]] / counts[batch["groups"]]
        )
        (grads,) = pullback(ct)
        state = apply_updates(state, grads, dstate)
        return state, {
            "loss": robust,
            "acc": acc,
            "group_losses": gl,
            "group_counts": gc,
        }

    return jax.jit(step)
