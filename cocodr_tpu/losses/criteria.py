"""Auxiliary criterion zoo + registry.

Rebuild of reference ANCE/model/loss.py:8-299 (the warmup driver imports
SymKlCriterion; the rest ship as a selectable registry). All pure functions
over logits; `alpha` scales each criterion like the reference's constructor
arg. Reductions follow the reference (batchmean for KL-family, mean for CE/
MSE unless stated).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _lsm(x):
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)


def _sm(x):
    return jax.nn.softmax(x.astype(jnp.float32), axis=-1)


def ce_loss(logits: Array, target_ids: Array, alpha: float = 1.0,
            ignore_index: int = -1) -> Array:
    """Cross entropy vs integer targets."""
    lsm = _lsm(logits)
    valid = target_ids != ignore_index
    safe = jnp.where(valid, target_ids, 0)
    nll = -jnp.take_along_axis(lsm, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return alpha * jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def mse_loss(input_logits: Array, target_logits: Array,
             alpha: float = 1.0) -> Array:
    return alpha * jnp.mean(
        jnp.square(
            input_logits.astype(jnp.float32) - target_logits.astype(jnp.float32)
        )
    )


def kl_loss(input_logits: Array, target_logits: Array,
            alpha: float = 1.0) -> Array:
    """KL(target || input), batchmean."""
    p = _sm(target_logits)
    lq = _lsm(input_logits)
    lp = _lsm(target_logits)
    kl = jnp.sum(p * (lp - lq), axis=-1)
    return alpha * jnp.mean(kl)


def stable_kl_loss(input_logits: Array, target_logits: Array,
                   alpha: float = 1.0, epsilon: float = 1e-6) -> Array:
    """The reference's numerically-stabilized KL (loss.py `stable_kl`):
    re-normalized probabilities with an epsilon floor. The rp/ry log-ratio
    terms are DETACHED exactly like the reference (loss.py:13-14) — the
    gradient flows only through the leading p factor."""
    p = _sm(input_logits)
    y = _sm(target_logits)
    rp = jax.lax.stop_gradient(
        -jnp.log(1.0 / (p + epsilon) - 1.0 + epsilon)
    )
    ry = jax.lax.stop_gradient(
        -jnp.log(1.0 / (y + epsilon) - 1.0 + epsilon)
    )
    return alpha * jnp.mean(jnp.sum(p * (rp - ry) * 2.0, axis=-1))


def sym_kl_loss(input_logits: Array, target_logits: Array,
                alpha: float = 1.0) -> Array:
    """Symmetric KL (SymKlCriterion, imported by the warmup driver).

    Reference semantics exactly (loss.py:112-127): each direction treats
    the OPPOSING distribution as a constant (torch .detach()), terms sum
    with no 0.5 factor, batchmean reduction:
      KL(sg(p_t) || p_i) + KL(sg(p_i) || p_t).
    """
    p_t = jax.lax.stop_gradient(_sm(target_logits))
    p_i = jax.lax.stop_gradient(_sm(input_logits))
    lq_i = _lsm(input_logits)
    lq_t = _lsm(target_logits)
    lp_t = jnp.log(jnp.maximum(p_t, 1e-30))
    lp_i = jnp.log(jnp.maximum(p_i, 1e-30))
    term1 = jnp.sum(p_t * (lp_t - lq_i), axis=-1)
    term2 = jnp.sum(p_i * (lp_i - lq_t), axis=-1)
    return alpha * jnp.mean(term1 + term2)


def js_loss(input_logits: Array, target_logits: Array,
            alpha: float = 1.0) -> Array:
    """JSCriterion semantics exactly (loss.py:145-163): m is the DETACHED
    mean distribution, each term is torch kl_div(log_softmax(x), m) =
    KL(m || p_x), summed with no 0.5 factor, batchmean reduction."""
    m = jax.lax.stop_gradient(
        0.5 * (_sm(input_logits) + _sm(target_logits))
    )
    lm = jnp.log(jnp.maximum(m, 1e-30))
    kl_m_i = jnp.sum(m * (lm - _lsm(input_logits)), axis=-1)
    kl_m_t = jnp.sum(m * (lm - _lsm(target_logits)), axis=-1)
    return alpha * jnp.mean(kl_m_i + kl_m_t)


def hellinger_loss(input_logits: Array, target_logits: Array,
                   alpha: float = 1.0) -> Array:
    """HLCriterion semantics exactly (loss.py:165-177): element-mean MSE of
    the sqrt distributions, BOTH detached — the reference criterion emits
    no gradient at all (a quirk preserved for parity; use js/sym_kl for a
    differentiable divergence)."""
    p = jax.lax.stop_gradient(jnp.sqrt(_sm(input_logits)))
    q = jax.lax.stop_gradient(jnp.sqrt(_sm(target_logits)))
    return alpha * jnp.mean(jnp.square(p - q))


def rank_ce_loss(pos_scores: Array, neg_scores: Array,
                 alpha: float = 1.0) -> Array:
    """Pairwise ranking as 2-way CE (RankCeCriterion)."""
    logits = jnp.stack([pos_scores, neg_scores], axis=-1).astype(jnp.float32)
    return alpha * jnp.mean(-jax.nn.log_softmax(logits, axis=-1)[..., 0])


def span_ce_loss(start_logits: Array, end_logits: Array, start_ids: Array,
                 end_ids: Array, alpha: float = 1.0) -> Array:
    """Span extraction CE over start+end (SpanCeCriterion)."""
    return alpha * 0.5 * (ce_loss(start_logits, start_ids) +
                          ce_loss(end_logits, end_ids))


def mlm_criterion(logits: Array, labels: Array, alpha: float = 1.0) -> Array:
    return ce_loss(logits, labels, alpha=alpha, ignore_index=-100)


LOSS_REGISTRY: Dict[str, Callable] = {
    "ce": ce_loss,
    "mse": mse_loss,
    "kl": kl_loss,
    "stable_kl": stable_kl_loss,
    "sym_kl": sym_kl_loss,
    "js": js_loss,
    "hellinger": hellinger_loss,
    "rank_ce": rank_ce_loss,
    "span_ce": span_ce_loss,
    "mlm": mlm_criterion,
}
