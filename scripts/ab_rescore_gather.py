#!/usr/bin/env python
"""A/B: candidate gather as 3-D block take (current) vs 2-D flat-row take,
plus gather-free variants, at the real rescore shape (1M x 768, Q=1024,
kf=101, fine=8)."""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cocodr_tpu.ops.pallas_mips import pallas_topk

N, D, Q, K = 2048 * 488, 768, 1024, 100
FINE = 8
N_FINE = N // FINE
KF = K + 1


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[:1]), out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.tree.map(lambda x: np.asarray(x[:1]), out)
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    print(f"{name:52s}: {best:8.2f} ms", flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    corpus = jax.device_put(jax.random.normal(k1, (N, D), jnp.bfloat16))
    queries = jax.device_put(jax.random.normal(k2, (Q, D), jnp.bfloat16))
    fine_ids = jax.device_put(
        jax.random.randint(k3, (Q, KF), 0, N_FINE, jnp.int32))

    @jax.jit
    def cur(corpus, q, fid):
        blocks = corpus.reshape(N_FINE, FINE, D)
        rows = jnp.take(blocks, fid, axis=0).reshape(Q, KF * FINE, D)
        s = jnp.einsum("qd,qkd->qk", q, rows,
                       preferred_element_type=jnp.float32)
        return pallas_topk(s, K)

    timeit("A 3-D block take + einsum + pallas_topk (cur)", cur,
           corpus, queries, fine_ids)

    @jax.jit
    def flat(corpus, q, fid):
        c2 = corpus.reshape(N_FINE, FINE * D)
        rows = jnp.take(c2, fid, axis=0).reshape(Q, KF * FINE, D)
        s = jnp.einsum("qd,qkd->qk", q, rows,
                       preferred_element_type=jnp.float32)
        return pallas_topk(s, K)

    timeit("B 2-D flat take + einsum + pallas_topk", flat,
           corpus, queries, fine_ids)

    @jax.jit
    def flat_sorted(corpus, q, fid):
        # sort ids per query: gather locality (hardware prefetch on
        # ascending addresses); scores map back through the sort perm
        c2 = corpus.reshape(N_FINE, FINE * D)
        order = jnp.argsort(fid, axis=1)
        fid_s = jnp.take_along_axis(fid, order, axis=1)
        rows = jnp.take(c2, fid_s, axis=0).reshape(Q, KF * FINE, D)
        s = jnp.einsum("qd,qkd->qk", q, rows,
                       preferred_element_type=jnp.float32)
        cand = (fid_s[:, :, None] * FINE
                + jnp.arange(FINE, dtype=jnp.int32)[None, None, :]).reshape(
            Q, KF * FINE)
        v, pos = pallas_topk(s, K)
        return v, jnp.take_along_axis(cand, pos, axis=1)

    timeit("C sorted-id flat take + einsum + topk", flat_sorted,
           corpus, queries, fine_ids)

    # D: per-query dynamic-slice loop via lax.map over queries in chunks —
    # XLA lowers take to dynamic-gather; compare scan of dynamic_slices
    @jax.jit
    def ds_gather(corpus, q, fid):
        c2 = corpus.reshape(N_FINE, FINE * D)

        def per_q(args):
            qv, ids = args  # [D], [KF]
            rows = jnp.take(c2, ids, axis=0).reshape(KF * FINE, D)
            return rows @ qv

        s = jax.lax.map(per_q, (queries, fid))
        return pallas_topk(s, K)

    timeit("D lax.map per-query take + matvec", ds_gather,
           corpus, queries, fine_ids)


if __name__ == "__main__":
    main()
