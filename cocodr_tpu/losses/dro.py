"""Distributionally robust group reweighting: DRO-greedy and iDRO.

Pure-functional rebuild of `DROGreedyLoss` / `iDROLoss`
(reference ANCE/model/dro_loss.py:11-254). The torch buffers (h_fun,
sum_losses, count_cat) become an explicit `DroState` pytree threaded through
the jitted train step; scatter_add becomes segment_sum; the per-group
`autograd.grad` loop becomes one vmapped VJP pullback; NCCL all_gather /
all_reduce become `lax.all_gather` / `psum` over the mesh data axis.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import flax.struct
import jax
import jax.flatten_util
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DroConfig:
    n_groups: int = 50
    alpha: float = 0.25
    eps: float = 0.01
    ema: float = 0.1
    rho: float = 0.05  # iDRO exponentiated-update step
    weight_ema: bool = False  # greedy: EMA-blend the new h_fun
    weight_cutoff: bool = True  # greedy weight_ema: clamp at eps


@flax.struct.dataclass
class DroState:
    h_fun: jnp.ndarray  # [G] group weights
    sum_losses: jnp.ndarray  # [G] EMA of group mean losses
    count_cat: jnp.ndarray  # [G] EMA of group batch counts


def dro_greedy_init(cfg: DroConfig) -> DroState:
    g = cfg.n_groups
    return DroState(
        h_fun=jnp.ones((g,), jnp.float32),
        sum_losses=jnp.zeros((g,), jnp.float32),
        count_cat=jnp.ones((g,), jnp.float32),
    )


idro_init = dro_greedy_init


def _segment_sum(x, ids, n):
    return jax.ops.segment_sum(x, ids, num_segments=n)


def _greedy_h_fun(cfg: DroConfig, state: DroState) -> jnp.ndarray:
    """α-cutoff weight update (`update_mw`, reference dro_loss.py:90-120):
    sort groups by running loss desc; weight 1/α for the groups whose
    cumulative population fraction stays under α; a fractional tiebreak
    weight at the cutoff; ε floor elsewhere."""
    past_losses = state.sum_losses
    past_frac = state.count_cat / jnp.sum(state.count_cat)
    sort_id = jnp.argsort(-past_losses)
    sorted_frac = past_frac[sort_id]
    cum = jnp.cumsum(sorted_frac)
    cutoff_count = jnp.sum((cum < cfg.alpha).astype(jnp.int32))
    cutoff_count = jnp.minimum(cutoff_count, cfg.n_groups - 1)

    ranks = jnp.arange(cfg.n_groups)
    h_sorted = jnp.where(ranks < cutoff_count, 1.0 / cfg.alpha, cfg.eps)
    # fractional weight for the group straddling the α boundary
    head_mass = jnp.where(ranks < cutoff_count, sorted_frac, 0.0).sum()
    leftover = 1.0 - head_mass / cfg.alpha
    tiebreak = leftover / sorted_frac[cutoff_count]
    tiebreak = jnp.maximum(tiebreak, cfg.eps)
    h_sorted = h_sorted.at[cutoff_count].set(tiebreak)
    # scatter back to group order
    h_new = jnp.zeros_like(h_sorted).at[sort_id].set(h_sorted)

    if cfg.weight_ema:
        if cfg.weight_cutoff:
            h_new = jnp.maximum(h_new, cfg.eps)
        h_new = state.h_fun * (1 - cfg.ema) + h_new * cfg.ema
    return h_new


def dro_greedy_loss(
    losses: jnp.ndarray,
    groups: jnp.ndarray,
    state: DroState,
    cfg: DroConfig,
    weights: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
    training: bool = True,
):
    """DRO-greedy robust loss (reference dro_loss.py:49-88).

    losses [B] per-sample (grad flows), groups [B] int, weights [B] optional.
    Returns (robust_loss, new_state, (group_losses, group_counts)) where the
    aux group stats are local-batch means as the reference returns.
    """
    if weights is not None:
        losses = losses * weights
    B = losses.shape[0]
    g_losses = _segment_sum(losses, groups, cfg.n_groups)
    robust_loss = jnp.sum(g_losses * state.h_fun) / B

    new_state = state
    if training:
        l_det = jax.lax.stop_gradient(losses)
        if axis_name is not None:
            s_agg = jax.lax.all_gather(groups, axis_name).reshape(-1)
            l_agg = jax.lax.all_gather(l_det, axis_name).reshape(-1)
        else:
            s_agg, l_agg = groups, l_det
        counts_agg = _segment_sum(jnp.ones_like(l_agg), s_agg, cfg.n_groups)
        sums_agg = _segment_sum(l_agg, s_agg, cfg.n_groups)
        means_agg = sums_agg / jnp.maximum(counts_agg, 1.0)
        valid = counts_agg > 0
        sum_losses = jnp.where(
            valid,
            state.sum_losses * (1 - cfg.ema) + means_agg * cfg.ema,
            state.sum_losses,
        )
        count_cat = state.count_cat * (1 - cfg.ema) + counts_agg * cfg.ema
        interim = DroState(
            h_fun=state.h_fun, sum_losses=sum_losses, count_cat=count_cat
        )
        new_state = interim.replace(h_fun=_greedy_h_fun(cfg, interim))

    l_det = jax.lax.stop_gradient(losses)
    counts = _segment_sum(jnp.ones_like(l_det), groups, cfg.n_groups)
    means = _segment_sum(l_det, groups, cfg.n_groups) / jnp.maximum(counts, 1.0)
    return robust_loss, new_state, (means, counts)


def per_group_grads(
    pullback: Callable,
    groups: jnp.ndarray,
    n_groups: int,
    lane_chunk: int = 0,
    store_dtype=None,
):
    """Per-group-mean-loss gradients via one vmapped VJP.

    The reference runs `torch.autograd.grad` once per group against the last
    2-3 encoder layers (reference dro_loss.py:174-204) — O(G) sequential
    backward passes sharing one graph. Here: `pullback` is the jax.vjp
    pullback of `params_lastk -> per_sample_losses [B]`; group i's cotangent
    is 1[g=b==i]/count_i, and vmap batches all G pullbacks into one pass.

    lane_chunk > 0 bounds memory: a lax.map over ceil(G/chunk) chunks of a
    chunk-wide vmap. One flat vmap of G=50 K=3-layer bert-base backwards
    does not fit (device-measured: the compile helper OOMs at B=64); the
    chunked form trades nothing but a scan carry — the math is identical.
    store_dtype (e.g. bf16) casts each lane's flattened grads for the [G,P]
    buffer, halving its HBM (4.2GB f32 at base K=3 G=50); the downstream
    Gram/normalization math still runs in f32 (idro_loss casts).

    Returns grads flattened per group: [G, P].
    """
    B = groups.shape[0]
    onehot = jax.nn.one_hot(groups, n_groups, dtype=jnp.float32)  # [B, G]
    counts = onehot.sum(axis=0)  # [G]
    cotangents = (onehot / jnp.maximum(counts, 1.0)[None, :]).T  # [G, B]

    def pull_one(ct):
        (grads,) = pullback(ct)
        flat, _ = jax.flatten_util.ravel_pytree(grads)
        return flat.astype(store_dtype) if store_dtype is not None else flat

    if lane_chunk and lane_chunk < n_groups:
        n_chunks = -(-n_groups // lane_chunk)
        pad = n_chunks * lane_chunk - n_groups
        ct = jnp.pad(cotangents, ((0, pad), (0, 0)))
        out = jax.lax.map(
            jax.vmap(pull_one), ct.reshape(n_chunks, lane_chunk, B)
        )  # [n_chunks, chunk, P]
        return out.reshape(n_chunks * lane_chunk, -1)[:n_groups]

    return jax.vmap(pull_one)(cotangents)  # [G, P]


def idro_loss(
    losses: jnp.ndarray,
    groups: jnp.ndarray,
    state: DroState,
    cfg: DroConfig,
    group_grads: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
    group_gram: Optional[jnp.ndarray] = None,
):
    """iDRO robust loss + multiplicative-exponentiated weight update
    (reference dro_loss.py:216-254).

    losses [B] (grad flows); group_grads [G, P] per-group gradients of the
    group-mean losses wrt the last-k encoder layers (see per_group_grads);
    psum'd over the data axis when axis_name is given, matching the
    reference's dist.all_reduce (dro_loss.py:232).

    robust_loss uses the PRE-update h_fun; the updated weights apply from
    the next step (buffer semantics of the torch module).

    Deliberate deviation: the reference updates h_fun from each rank's LOCAL
    group losses/counts (only grads are all_reduced, dro_loss.py:232), so
    per-GPU h_fun buffers silently diverge. Under SPMD the state is
    replicated, so we psum losses/counts too — one coherent global update.

    Alternative input `group_gram` [G, G]: the raw Gram matrix
    group_grads @ group_grads.T. The update only ever consumes the grads
    through their norms (diagonal) and normalized inner products, so
    callers that can form the Gram without materializing [G, P] grads
    (see train_step's per-sample-Gram group pass) skip the G backward
    passes entirely. Not valid with axis_name: the Gram of a sum of
    per-rank grads has cross-rank terms a psum of per-rank Grams lacks.
    """
    assert (group_grads is None) != (group_gram is None), (
        "pass exactly one of group_grads / group_gram"
    )
    counts = _segment_sum(
        jnp.ones_like(losses), groups, cfg.n_groups
    )  # [G]
    gl = _segment_sum(losses, groups, cfg.n_groups) / jnp.maximum(counts, 1.0)
    robust_loss = jnp.sum(gl * jax.lax.stop_gradient(state.h_fun))

    if group_gram is not None:
        assert axis_name is None, (
            "group_gram is single-replica / global-batch only"
        )
        counts_agg = counts
        gl_agg = jax.lax.stop_gradient(gl)
        m = jax.lax.stop_gradient(group_gram).astype(jnp.float32)
        gnorm = jnp.sqrt(jnp.maximum(jnp.diagonal(m), 0.0))
        denom = (1e-12 + gnorm)[:, None] * (1e-12 + gnorm)[None, :]
        rtg = m / denom
    else:
        grads = group_grads
        if axis_name is not None:
            grads = jax.lax.psum(grads, axis_name)
            counts_agg = jax.lax.psum(counts, axis_name)
            gl_agg = jax.lax.psum(
                jax.lax.stop_gradient(gl) * counts, axis_name
            ) / jnp.maximum(counts_agg, 1.0)
        else:
            counts_agg = counts
            gl_agg = jax.lax.stop_gradient(gl)
        grads = jax.lax.stop_gradient(grads)

        # Rows may be stored bf16 (per_group_grads store_dtype). Norms
        # accumulate in f32 via a fused square-sum reduction (no f32
        # [G,P] materialization); normalized rows stay in the storage
        # dtype and the Gram matmul accumulates f32 on the MXU.
        gnorm = jnp.sqrt(jnp.sum(
            jnp.square(grads.astype(jnp.float32)), axis=-1, keepdims=True))
        grads = grads / (1e-12 + gnorm).astype(grads.dtype)
        rtg = jnp.matmul(grads, grads.T, preferred_element_type=jnp.float32)
    glp = jnp.power(gl_agg, cfg.alpha)[:, None]
    rtg = (glp @ glp.T) * rtg
    mask = (counts_agg > 0).astype(jnp.float32)
    e = cfg.rho * jnp.mean(rtg, axis=0) * mask
    e = e - jnp.max(e)
    weight = jnp.exp(e)

    h = jnp.power(state.h_fun, cfg.ema) * weight * mask
    h = h / jnp.sum(h)
    h = jnp.maximum(h, cfg.eps)
    new_state = state.replace(h_fun=h)
    return robust_loss, new_state, (gl_agg, counts_agg)


def dro_state_summary(state: DroState) -> dict:
    """Scalarized DRO state for logging — the reference's `output_state()`
    JSON dump of per-group h_fun / running losses (ANCE/model/
    models.py:275-280), reduced to TB-friendly scalars plus the full
    vectors as lists."""
    import numpy as np

    h = np.asarray(state.h_fun)
    sl = np.asarray(state.sum_losses)
    p = h / max(h.sum(), 1e-30)
    ent = float(-(p * np.log(np.maximum(p, 1e-30))).sum())
    return {
        "dro_h_min": float(h.min()),
        "dro_h_max": float(h.max()),
        "dro_h_entropy": ent,
        "dro_loss_ema_mean": float(sl.mean()),
        "dro_h_fun": h.tolist(),
        "dro_sum_losses": sl.tolist(),
    }
