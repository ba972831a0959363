"""LAMB with the reference's exact semantics, as an optax transformation.

The reference ships its own Lamb (reference ANCE/utils/lamb.py:24-123 =
warmup/utils/lamb.py) which differs from both the paper and optax.lamb:
  - NO bias correction of the Adam moments ("Paper v3 does not use
    debiasing", lamb.py:100-102);
  - weight norm clamped to [0, 10] (lamb.py:104);
  - weight decay added INTO the adam step before the trust ratio
    (lamb.py:107-108);
  - trust_ratio = 1 when either norm is zero (lamb.py:110-113);
  - `adam=True` forces trust_ratio = 1 (plain un-debiased Adam).
Matching these exactly matters for hyperparameter parity (LR 2e-4 with LAMB,
warmup/commands/run_bm25_warmup.sh).

Scan-stacked layers: the trust ratio is PER-TENSOR in torch, and the
reference model holds each encoder layer's weights as separate tensors.
Our flax encoder stacks the L layers into single [L, ...] leaves
(nn.scan), so a naive per-leaf trust ratio would couple all layers'
norms — a real training-dynamics divergence (caught by
tests/test_trajectory_parity.py). Leaves whose tree path goes through a
key named 'layer' (the scan convention in models/bert.py) get their
trust ratio per leading-axis slice instead, restoring the reference's
per-layer-tensor semantics exactly.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax


class ScaleByLambState(NamedTuple):
    mu: optax.Updates
    nu: optax.Updates


def _is_stacked(path) -> bool:
    """True for leaves under a scan-stacked 'layer' collection, whose
    axis 0 enumerates encoder layers (models/bert.py nn.scan)."""
    return any(getattr(k, "key", None) == "layer" for k in path)


def scale_by_reference_lamb(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    adam: bool = False,
) -> optax.GradientTransformation:
    def init_fn(params):
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return ScaleByLambState(mu=mu, nu=nu)

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("lamb requires params")
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g), state.nu, updates
        )

        def step(path, m, v, p):
            adam_step = m / (jnp.sqrt(v) + eps)
            if weight_decay != 0.0:
                adam_step = adam_step + weight_decay * p
            if adam:
                return adam_step
            # per-layer trust ratios for scan-stacked leaves: reduce over
            # all axes but the stacked (layer) axis 0
            axes = tuple(range(1, p.ndim)) if _is_stacked(path) else None
            keep = axes is not None

            def norm(x):
                return jnp.sqrt(
                    jnp.sum(jnp.square(x), axis=axes, keepdims=keep)
                )

            weight_norm = jnp.clip(norm(p), 0.0, 10.0)
            adam_norm = norm(adam_step)
            trust = jnp.where(
                (weight_norm == 0.0) | (adam_norm == 0.0),
                1.0,
                weight_norm / jnp.maximum(adam_norm, 1e-38),
            )
            return trust * adam_step

        out = jax.tree_util.tree_map_with_path(step, mu, nu, params)
        return out, ScaleByLambState(mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def lamb(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    adam: bool = False,
) -> optax.GradientTransformation:
    return optax.chain(
        scale_by_reference_lamb(b1, b2, eps, weight_decay, adam),
        optax.scale_by_learning_rate(learning_rate),
    )
