"""Jitted L2 k-means (Lloyd) — replaces `faiss.Kmeans` for iDRO query
clustering (reference ANCE/drivers/run_ann_data_gen.py:340-373: d=768,
n_clusters=50, niter=500, nredo=5; assignment via index.search).

One Lloyd step = one [N, C] distance matmul (MXU) + argmin + segment_sum —
exactly the shape TPUs like. Multi-restart (`nredo`) picks the lowest-
inertia run. Empty clusters are re-seeded from the point furthest from its
centroid (faiss splits big clusters; furthest-point reseeding is the same
idea and deterministic).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _assign(x, centroids):
    """argmin_c ||x - c||^2 via x2 - 2xc + c2; returns (ids [N], sqdists [N])."""
    x2 = jnp.sum(jnp.square(x), axis=1, keepdims=True)  # [N,1]
    c2 = jnp.sum(jnp.square(centroids), axis=1)[None, :]  # [1,C]
    xc = jnp.matmul(x, centroids.T, preferred_element_type=jnp.float32)
    d2 = x2 - 2.0 * xc + c2  # [N, C]
    ids = jnp.argmin(d2, axis=1)
    best = jnp.min(d2, axis=1)
    return ids, jnp.maximum(best, 0.0)


def _lloyd_step(x, centroids):
    n_clusters = centroids.shape[0]
    ids, d2 = _assign(x, centroids)
    counts = jax.ops.segment_sum(
        jnp.ones_like(d2), ids, num_segments=n_clusters
    )
    sums = jax.ops.segment_sum(x, ids, num_segments=n_clusters)
    new_c = sums / jnp.maximum(counts, 1.0)[:, None]
    # keep old centroid where empty, then reseed empties from the point
    # with the largest distance to its assigned centroid
    empty = counts == 0
    new_c = jnp.where(empty[:, None], centroids, new_c)
    far_idx = jnp.argmax(d2)
    far_pt = x[far_idx]
    # reseed at most one empty cluster per iteration (deterministic)
    first_empty = jnp.argmax(empty)
    any_empty = jnp.any(empty)
    new_c = jnp.where(
        (jnp.arange(n_clusters) == first_empty)[:, None] & any_empty,
        far_pt[None, :],
        new_c,
    )
    inertia = jnp.sum(d2)
    return new_c, inertia


@functools.partial(jax.jit, static_argnames=("n_clusters", "n_iter"))
def _kmeans_single(x, init_centroids, n_clusters: int, n_iter: int):
    def body(carry, _):
        c, _ = carry
        c, inertia = _lloyd_step(x, c)
        return (c, inertia), None

    (centroids, inertia), _ = jax.lax.scan(
        body, (init_centroids, jnp.inf), None, length=n_iter
    )
    ids, d2 = _assign(x, centroids)
    return centroids, ids, jnp.sum(d2)


def kmeans(
    x: jnp.ndarray,
    n_clusters: int,
    n_iter: int = 100,
    n_redo: int = 1,
    seed: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (centroids [C, D], assignments [N]). Best of n_redo restarts."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    best = None
    for r in range(n_redo):
        key = jax.random.PRNGKey(seed + r)
        idx = jax.random.choice(key, n, (n_clusters,), replace=False)
        init = x[idx]
        centroids, ids, inertia = _kmeans_single(x, init, n_clusters, n_iter)
        inertia = float(inertia)
        if best is None or inertia < best[2]:
            best = (centroids, ids, inertia)
    return best[0], best[1]


def assign_clusters(x, centroids):
    """Nearest-centroid assignment (the miner's index.search over centroids)."""
    ids, _ = _assign(jnp.asarray(x, jnp.float32), centroids)
    return ids
